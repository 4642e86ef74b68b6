"""ReconEngine integration tests (CPU, small configs): dense vs ray modes,
pallas head equivalence (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.config import CN
from monoport_tpu.engine import EngineCfg, ReconEngine
from monoport_tpu.models import MonoPortNet
from monoport_tpu.recon.hierarchy import HierarchicalRecon


def _nets():
    g = CN()
    g.projection = "orthogonal"
    g.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                     "num_hourglass": 1, "hourglass_dim": 256,
                     "norm": "group", "hg_down": "ave_pool"})
    g.normalizer = CN({"IMF": "PIFuNomalizer"})
    g.head = CN({"IMF": "PIFuNetGMLP"})
    g.loss = CN({"IMF": "MSE"})
    c = CN()
    c.projection = "orthogonal"
    c.backbone = CN({"IMF": "PIFuResBlkFilters"})
    c.normalizer = CN({"IMF": "PIFuNomalizer"})
    c.head = CN({"IMF": "PIFuNetCMLP"})
    c.loss = CN({"IMF": "L1"})
    return MonoPortNet(g), MonoPortNet(c)


@pytest.fixture(scope="module")
def setup():
    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))
    return netG, netC, params_g, params_c, image, calib


def test_engine_dense_and_ray_modes(setup):
    netG, netC, params_g, params_c, image, calib = setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    dense = ReconEngine(netG, netC, recon=recon, config=EngineCfg.flat(render_size=64))
    out = dense.frame(params_g, image, params_c, image, calib)
    assert out["sdf"].shape == (17, 17, 17)
    assert out["render_norm"].shape == (64, 64, 3)
    assert out["render_tex"].shape == (64, 64, 3)

    ray = ReconEngine(netG, netC, recon=recon,
              config=EngineCfg.flat(render_size=64, mode="ray", fine_res=33,
                                    ray_taps=4))
    out_r = ray.frame(params_g, image, params_c, image, calib)
    assert out_r["depth"].shape == (33, 33)
    assert out_r["render_norm"].shape == (64, 64, 3)


def test_engine_ray_query_gated_on_calib(setup):
    """The ray-structured fast path is only valid for calibs with z-free
    image-plane rows (monoport_net.query_taps docstring); a rotated view
    calib (the demo's orbit camera) must select the exact per-point fine
    pass. Checks the gate directly AND that the rotated-calib output is
    bitwise identical to an engine with the fast path disabled."""
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic

    netG, netC, params_g, params_c, image, calib = setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, None, recon=recon,
              config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                    ray_taps=4))
    assert eng._calib_taps_ok(calib)  # identity: fast path allowed

    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 15.0),
                                 np.eye(4, dtype=np.float32)))  # [1,4,4]
    assert float(jnp.abs(rot[0, :2, 2]).max()) > 1e-4  # genuinely rotated
    assert not eng._calib_taps_ok(rot)

    out = eng.frame(params_g, image, calib=rot)
    ref = ReconEngine(netG, None, recon=recon,
              config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                    ray_taps=4, use_ray_query=False))
    want = ref.frame(params_g, image, calib=rot)
    np.testing.assert_array_equal(np.asarray(out["depth"]),
                                  np.asarray(want["depth"]))


def test_engine_pallas_head_equivalence(setup):
    netG, _, params_g, _, image, calib = setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    base = ReconEngine(netG, None, recon=recon, config=EngineCfg.flat(render_size=32))
    fast = ReconEngine(netG, None, recon=recon,
               config=EngineCfg.flat(render_size=32, use_pallas=True,
                                     pallas_interpret=True))
    out_a = base.frame(params_g, image, calib=calib)
    out_b = fast.frame(params_g, image, calib=calib)
    np.testing.assert_allclose(np.asarray(out_a["sdf"]),
                               np.asarray(out_b["sdf"]),
                               atol=2e-5, rtol=1e-4)


def test_engine_march_mode(setup):
    """march_levels: frontal frames run the volume-free pyramid (no sdf in
    the output); rotated calibs ALSO march (per-point query) by default,
    and fall back to the hierarchy path with march_rotated=False."""
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic

    netG, netC, params_g, params_c, image, calib = setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, netC, recon=recon,
              config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                    ray_taps=4, march_levels=(9, 17)))
    out = eng.frame(params_g, image, params_c, image, calib)
    assert "sdf" not in out and "recon_counts" not in out
    assert out["depth"].shape == (33, 33)
    assert out["render_norm"].shape == (32, 32, 3)
    assert out["render_tex"].shape == (32, 32, 3)

    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 15.0),
                                 np.eye(4, dtype=np.float32)))
    out_rot = eng.frame(params_g, image, calib=rot)
    assert "sdf" not in out_rot  # rotated frames march too (per-point)
    assert out_rot["depth"].shape == (33, 33)

    legacy = ReconEngine(netG, netC, recon=recon,
                 config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                       ray_taps=4, march_levels=(9, 17),
                                       march_rotated=False))
    out_leg = legacy.frame(params_g, image, calib=rot)
    assert "sdf" in out_leg  # hierarchy fallback ran

    # frames(): the batched path takes the same gate
    images = jnp.tile(image[0][None], (2, 1, 1, 1))
    outs = eng.frames(params_g, images)
    assert "sdf" not in outs
    assert outs["depth"].shape == (2, 33, 33)


def test_engine_per_point_march_matches_taps_march(setup):
    """The march_rotated route rides ONLY the generic per-point query.
    On a FRONTAL calib the same pyramid runs through the taps-structured
    query, so driving the per-point route there (use_ray_query=False
    makes every calib taps-ineligible) must reproduce the taps-route
    output — the real guard that the per-point march computes the same
    surface as the structured one."""
    netG, _, params_g, _, image, calib = setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, None, recon=recon,
              config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                    ray_taps=4, march_levels=(9, 17)))
    # compact_rotated=None: this test isolates the per-point MARCH (vs the
    # taps route); compaction is covered by tests/test_compact_rays.py and
    # would add knife-edge scatter on this random-init ~0.5 field
    plain = ReconEngine(netG, None, recon=recon,
                config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                      ray_taps=4, march_levels=(9, 17),
                                      use_ray_query=False, march_rotated=True,
                                      compact_rotated=None))
    out_a = eng.frame(params_g, image, calib=calib)     # taps route
    out_b = plain.frame(params_g, image, calib=calib)   # per-point route
    assert "sdf" not in out_a and "sdf" not in out_b    # both marched
    # a random-init net sits at occupancy ~0.5 everywhere, so last-bit
    # reassociation can flip `> 0.5` on knife-edge rays — require
    # near-total agreement (same policy as test_engine_grid_path_*)
    a = np.asarray(out_a["depth"], np.float64)
    b = np.asarray(out_b["depth"], np.float64)
    assert (np.abs(a - b) > 2e-5).mean() < 0.005
    va = np.asarray(out_a["valid"])
    vb = np.asarray(out_b["valid"])
    assert (va != vb).mean() < 0.005


def test_engine_march_gate_keeps_hierarchy_for_ineligible_nets():
    """Frontal frames whose net cannot build the ray head (soft-onehot
    normalizer) must keep the r2 hierarchy path — the march gate requires
    qt on the frontal branch (review finding: the gate briefly marched
    these per-point, silently dropping 'sdf')."""
    from monoport_tpu.config import CN
    from monoport_tpu.models import MonoPortNet

    g = CN()
    g.projection = "orthogonal"
    g.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                     "num_hourglass": 1, "hourglass_dim": 256,
                     "norm": "group", "hg_down": "ave_pool"})
    g.normalizer = CN({"IMF": "PIFuNomalizer", "soft_onehot": True,
                       "soft_dim": 8})
    g.head = CN({"IMF": "PIFuNetGMLP"})
    g.loss = CN({"IMF": "MSE"})
    netG = MonoPortNet(g)
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, None, recon=recon,
              config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                    ray_taps=4, march_levels=(9, 17),
                                    march_rotated=False))
    out = eng.frame(params_g, image, calib=calib)
    assert "sdf" in out  # hierarchy ran: qt is None for soft-onehot


def test_engine_batched_frames(setup):
    netG, netC, params_g, params_c, image, calib = setup
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, None, recon=recon, config=EngineCfg.flat(render_size=32))
    images = jnp.tile(image[0][None], (3, 1, 1, 1))  # [3, 64, 64, 3]
    out = eng.frames(params_g, images)
    assert out["render_norm"].shape == (3, 32, 32, 3)
    assert out["sdf"].shape == (3, 17, 17, 17)
    # batch consistency: same input frame -> same output
    np.testing.assert_allclose(np.asarray(out["sdf"][0]),
                               np.asarray(out["sdf"][2]), atol=1e-6)
