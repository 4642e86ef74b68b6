"""Multi-chip inference: engine frame with point/ray batches sharded over
the mesh 'points' axis must equal the single-device frame (SURVEY §5.7 —
the long axis is the query-point count; the mesh shards it while features
stay replicated)."""

import numpy as np

import jax
import jax.numpy as jnp

from monoport_tpu.engine import EngineCfg, ReconEngine
from monoport_tpu.parallel import make_mesh
from monoport_tpu.recon.hierarchy import HierarchicalRecon


def test_engine_mesh_matches_single_device():
    from tests.test_engine import _nets

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=64, mode="ray", fine_res=33,
              ray_taps=4)
    single = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(**kw))
    mesh = make_mesh(len(jax.devices()))  # (data, points) axes
    assert "points" in mesh.axis_names
    sharded = ReconEngine(netG, netC, mesh=mesh, recon=recon,
                config=EngineCfg.flat(**kw))

    out_s = single.frame(params_g, image, params_c, image, calib)
    out_m = sharded.frame(params_g, image, params_c, image, calib)
    for key in ("depth", "render_norm", "render_tex", "mask"):
        np.testing.assert_allclose(np.asarray(out_m[key]),
                                   np.asarray(out_s[key]),
                                   atol=1e-5, err_msg=key)
    # the fine ray batch must actually be partitioned, not replicated:
    # compile the frame and look for sharded intermediates
    lowered = jax.jit(sharded._frame_impl).lower(
        params_g, params_c, image, image, calib)
    txt = lowered.compile().as_text()
    assert ("all-gather" in txt or "all-reduce" in txt
            or "collective-permute" in txt), \
        "no collectives in the compiled frame => nothing was sharded"


def test_engine_mesh_keeps_pallas():
    """VERDICT r2 item 4: mesh mode must no longer forfeit the Pallas
    kernels. The heads are shard_map'ed over 'points'
    (engine._shard_map_head) and must reproduce the single-device Pallas
    output (interpret mode on CPU)."""
    from tests.test_engine import _nets

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=64, mode="ray", fine_res=33,
              ray_taps=4, use_pallas=True, pallas_interpret=True)
    single = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(**kw))
    mesh = make_mesh(len(jax.devices()))
    # 'points' axis spans >1 device so the shard_map wrapper is active
    assert mesh.shape["points"] > 1
    sharded = ReconEngine(netG, netC, mesh=mesh, recon=recon,
                config=EngineCfg.flat(**kw))

    out_s = single.frame(params_g, image, params_c, image, calib)
    out_m = sharded.frame(params_g, image, params_c, image, calib)
    for key in ("depth", "render_norm", "render_tex", "mask"):
        np.testing.assert_allclose(np.asarray(out_m[key]),
                                   np.asarray(out_s[key]),
                                   atol=1e-5, err_msg=key)


def test_engine_mesh_rotated_adaptive_anchored():
    """The round-4 rotated paths under the mesh (VERDICT r4 item 7): a
    rotated-calib frame running the ANCHORED refine head (a Pallas kernel
    shard_map'ed over 'points') at an ADAPTIVE compact budget below the
    constructor ceiling must equal the single-device frame bit-for-bit in
    geometry and texture, and must surface the same drop telemetry."""
    from tests.test_engine import _nets
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=64, mode="ray", fine_res=33, ray_taps=4,
              ray_window=24, march_levels=(9, 17), compact_rotated=0.625,
              rot_anchors=2, use_pallas=True, pallas_interpret=True)
    single = ReconEngine(netG, netC, recon=recon,
                         config=EngineCfg.flat(**kw))
    mesh = make_mesh(len(jax.devices()))
    assert mesh.shape["points"] > 1
    sharded = ReconEngine(netG, netC, mesh=mesh, recon=recon,
                          config=EngineCfg.flat(**kw))

    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    assert not sharded._calib_taps_ok(rot)
    # a hint below the ceiling selects a smaller COMPACT_LADDER rung, so
    # this exercises the adaptive program variant, not the default trace
    from monoport_tpu.engine import _snap_budget
    hint = 0.3
    assert _snap_budget(hint, 0.625) == 0.375

    out_s = single.frame(params_g, image, params_c, image, calib=rot,
                         compact_hint=hint)
    out_m = sharded.frame(params_g, image, params_c, image, calib=rot,
                          compact_hint=hint)
    assert "compact_dropped" in out_m
    np.testing.assert_array_equal(np.asarray(out_m["compact_dropped"]),
                                  np.asarray(out_s["compact_dropped"]))
    for key in ("depth", "valid", "render_norm", "render_tex", "mask"):
        np.testing.assert_allclose(np.asarray(out_m[key]),
                                   np.asarray(out_s[key]),
                                   atol=1e-5, err_msg=key)


def test_engine_mesh_grid_path():
    """The separable gather-free grid program (r3) under a mesh: the
    sampling einsums lower under SPMD while the shard_map'ed Pallas heads
    shard the flattened ray axis — output equals single-device, windowed
    texture included."""
    from tests.test_engine import _nets

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=64, mode="ray", fine_res=33,
              ray_taps=4, ray_window=24, march_levels=(9, 17),
              use_pallas=True, pallas_interpret=True)
    single = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(**kw))
    mesh = make_mesh(len(jax.devices()))
    assert mesh.shape["points"] > 1
    sharded = ReconEngine(netG, netC, mesh=mesh, recon=recon,
                config=EngineCfg.flat(**kw))
    assert sharded._calib_grid_ok(calib)
    assert sharded._query_grid_fn(
        netG, params_g,
        netG.apply(params_g, image, method="filter"), calib) is not None

    out_s = single.frame(params_g, image, params_c, image, calib)
    out_m = sharded.frame(params_g, image, params_c, image, calib)
    assert "sdf" not in out_m      # march pyramid ran
    for key in ("depth", "render_norm", "render_tex", "mask"):
        np.testing.assert_allclose(np.asarray(out_m[key]),
                                   np.asarray(out_s[key]),
                                   atol=1e-5, err_msg=key)
