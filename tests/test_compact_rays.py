"""Compacted per-point fine pass (ray_refine._refine_core_compact) — the
rotated-view cost lever: query only coarse-valid rays (static budget),
scatter the results back. Contract: valid-ray geometry is IDENTICAL to the
dense per-point pass; coarse-rejected rays keep their coarse fallback;
budget overflow degrades to the coarse silhouette (never holes)."""

import numpy as np

import jax
import jax.numpy as jnp

from monoport_tpu.recon.ray_refine import _compact_rays, ray_pyramid


def _sphere_query(pts, center=(0.0, -0.1, 0.05), radius=0.42):
    d = jnp.linalg.norm(pts - jnp.asarray(center), axis=-1)
    return jax.nn.sigmoid((radius - d) * 40.0)[..., None]


def _query(pts):
    return _sphere_query(pts)


def _run(compact, window=None):
    return ray_pyramid(_query, 33, levels=(9, 17), taps=4,
                       window=window, compact=compact)


def test_compact_budget_sizing():
    assert _compact_rays(None, 33, 33) is None
    assert _compact_rays(1.0, 33, 33) is None
    assert _compact_rays(0.625, 33, 33) == 768       # ceil to 256 multiple
    assert _compact_rays(0.99, 16, 16) == 256        # capped at h*w
    assert _compact_rays(0.5, 192, 192) == 18432


def test_compact_matches_dense_at_valid_rays():
    dense = _run(None)
    comp = _run(0.625)
    vd = np.asarray(dense.valid)
    vc = np.asarray(comp.valid)
    # the silhouette is identical (all coarse-valid rays fit the budget)
    np.testing.assert_array_equal(vd, vc)
    # depth at valid rays is identical (same taps, same crossing math)
    np.testing.assert_array_equal(np.asarray(dense.depth)[vd],
                                  np.asarray(comp.depth)[vd])
    # normals are identical at valid rays whose backward 2-neighborhood is
    # valid too (boundary rays reference the depth of skipped invalid
    # neighbors, which legitimately keep the coarse fallback)
    interior = vd.copy()
    for shift in (1, 2):
        interior[shift:] &= vd[:-shift]
        interior[:, shift:] &= vd[:, :-shift]
    np.testing.assert_allclose(np.asarray(dense.normal)[interior],
                               np.asarray(comp.normal)[interior],
                               atol=1e-6)


def test_compact_matches_dense_windowed():
    dense = _run(None, window=24)
    comp = _run(0.625, window=24)
    vd = np.asarray(dense.valid)
    np.testing.assert_array_equal(vd, np.asarray(comp.valid))
    np.testing.assert_array_equal(np.asarray(dense.depth)[vd],
                                  np.asarray(comp.depth)[vd])


def test_compact_overflow_degrades_to_coarse_silhouette():
    """A budget far below the valid-ray count must not punch holes: the
    dropped rays keep the coarse silhouette (halo), so the compact valid
    mask is a SUPERSET of the dense one restricted to queried rays and
    still covers the subject."""
    dense = _run(None)
    tiny = _run(0.05)            # 33^2 * 0.05 -> 256-ray budget, overflows
    vd = np.asarray(dense.valid)
    vt = np.asarray(tiny.valid)
    inter = (vd & vt).sum()
    assert inter / max(vd.sum(), 1) > 0.95, "overflow punched holes"
    assert np.isfinite(np.asarray(tiny.depth)).all()
    assert np.isfinite(np.asarray(tiny.normal)).all()


def test_engine_compact_frontal_untouched():
    """compact_rotated must not perturb frontal frames (grid/taps path):
    bit-identical output with and without the flag."""
    from tests.test_engine import _nets

    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=32, mode="ray", fine_res=33,
              ray_taps=4, march_levels=(9, 17), ray_window=24)
    dense = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=None, **kw))
    comp = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=0.625, **kw))
    out_f_d = dense.frame(params_g, image, params_c, image, calib=calib)
    out_f_c = comp.frame(params_g, image, params_c, image, calib=calib)
    np.testing.assert_array_equal(np.asarray(out_f_d["depth"]),
                                  np.asarray(out_f_c["depth"]))
    np.testing.assert_array_equal(np.asarray(out_f_d["render_tex"]),
                                  np.asarray(out_f_c["render_tex"]))


def test_engine_compact_rotated_frame_trained():
    """Rotated-calib frame with compact_rotated vs the dense per-point
    march, on the TRAINED weights (a real surface — random-init nets sit
    at occupancy ~0.5 where knife-edge crossings make depth comparisons
    meaningless): same silhouette, same valid-ray depth, same texture at
    the reconstructed surface."""
    import os

    import pytest

    from monoport_tpu.config import get_cfg_defaults
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.recon.hierarchy import HierarchicalRecon
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)
    from monoport_tpu.utils.params_io import load_params

    data = os.path.join(os.path.dirname(__file__), os.pardir,
                        "monoport_tpu", "data")
    pg = os.path.join(data, "netg_capsule.npz")
    pc = os.path.join(data, "netc_capsule.npz")
    if not (os.path.exists(pg) and os.path.exists(pc)):
        pytest.skip("committed capsule checkpoints absent")
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)
    params_g = {"params": load_params(pg)[0]}
    params_c = {"params": load_params(pc)[0]}

    caps = skeleton3d(jax.random.PRNGKey(4242))      # held-out body
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    recon = HierarchicalRecon(resolutions=(17, 33), budgets=(0, 4096),
                              select="uncertain")
    kw = dict(mode="ray", fine_res=65, ray_taps=6,
              ray_window=48, march_levels=(17, 33))
    dense = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=None, **kw))
    comp = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=0.625, **kw))
    out_d = dense.frame(params_g, image, params_c, image, calib=rot)
    out_c = comp.frame(params_g, image, params_c, image, calib=rot)

    vd = np.asarray(out_d["valid"])
    vc = np.asarray(out_c["valid"])
    assert vd.sum() > 100                  # the body is actually there
    assert (vd != vc).mean() < 0.005, "compact changed the silhouette"
    both = vd & vc
    dd = np.asarray(out_d["depth"])[both]
    dc = np.asarray(out_c["depth"])[both]
    assert (np.abs(dd - dc) > 1e-3).mean() < 0.01, "valid-ray depth moved"
    td = np.asarray(out_d["render_tex"])
    tc = np.asarray(out_c["render_tex"])
    assert np.abs(td - tc).mean() < 0.01, "texture moved"


def test_compact_dropped_telemetry_fires_exactly_on_overflow():
    """frame()['compact_dropped'] is zero when every valid ray fits the
    budget and counts EXACTLY the degraded rays on overflow (VERDICT r3
    item 6: overflow must be observable, not a green log)."""
    from tests.test_engine import _nets

    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    rot = jnp.asarray([[[0.95, 0.0, 0.3, 0.0],
                        [0.0, 1.0, 0.1, 0.0],
                        [-0.3, 0.0, 0.95, 0.0],
                        [0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, rot)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, rot,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=32, mode="ray", fine_res=33,
              ray_taps=4, march_levels=(9, 17), ray_window=24,
              rot_anchors=None)

    ample = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=1.0, **kw))
    out_a = ample.frame(params_g, image, params_c, image, calib=rot)
    assert "compact_dropped" not in out_a     # 1.0 -> dense, no budgets
    assert "no ray compaction" in ample.compact_report(out_a)

    roomy = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=0.99, **kw))
    out_r = roomy.frame(params_g, image, params_c, image, calib=rot)
    # capped at h*w: every valid ray fits, nothing dropped
    dropped = np.asarray(out_r["compact_dropped"])
    assert dropped.shape[0] == 3              # 2 refine levels + texture
    assert (dropped == 0).all(), dropped
    assert "ok" in roomy.compact_report(out_r)

    tiny = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=0.05, **kw))
    out_t = tiny.frame(params_g, image, params_c, image, calib=rot)
    dropped_t = np.asarray(out_t["compact_dropped"])
    # exact count: valid rays at each level beyond the 256-ray budget
    # (random-init nets leave ~everything valid, so overflow is certain)
    assert (dropped_t > 0).any(), dropped_t
    n_valid_fine = np.asarray(out_r["valid"]).sum()  # proxy: plenty valid
    assert n_valid_fine > 256
    assert "OVERFLOW" in tiny.compact_report(out_t)


def test_snap_budget_ladder():
    from monoport_tpu.engine import COMPACT_LADDER, _snap_budget

    assert COMPACT_LADDER[0] == 0.25          # floor rung
    assert _snap_budget(0.1, 0.5) == 0.25     # tiny hints floor at 0.25
    assert _snap_budget(0.25, 0.5) == 0.25
    assert _snap_budget(0.26, 0.5) == 0.375
    assert _snap_budget(0.4, 0.5) == 0.5
    assert _snap_budget(0.9, 0.5) == 0.5      # capped at the ceiling
    assert _snap_budget(0.3, 0.25) == 0.25    # ceiling below the rung


def test_adaptive_rung_bit_identical_when_nothing_drops():
    """A smaller COMPACT_LADDER rung is BIT-identical to the dense pass
    whenever every valid ray fits it (the budget only caps capacity,
    never changes queried values) — the adaptive demo loop is a pure
    speed knob on typical subjects. The sphere covers ~14% of the
    lattice, under the 0.25 floor rung."""
    dense = _run(None)
    rung = _run(0.25)
    np.testing.assert_array_equal(np.asarray(dense.depth),
                                  np.asarray(rung.depth))
    np.testing.assert_array_equal(np.asarray(dense.valid),
                                  np.asarray(rung.valid))


def test_adaptive_hint_selects_the_rung_program():
    """frame(compact_hint=...) must run EXACTLY the program an engine
    constructed with that rung as its ceiling runs — bitwise-equal
    outputs and telemetry (the hint is a program selector, nothing
    more). Random-init nets leave ~everything valid, so the 0.25 rung
    drops rays here: both paths must drop the SAME rays. Frontal frames
    ignore the hint entirely."""
    from tests.test_engine import _nets

    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    rot = jnp.asarray([[[0.95, 0.0, 0.3, 0.0],
                        [0.0, 1.0, 0.1, 0.0],
                        [-0.3, 0.0, 0.95, 0.0],
                        [0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, rot)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, rot,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=32, mode="ray", fine_res=33,
              ray_taps=4, march_levels=(9, 17), ray_window=24,
              rot_anchors=None)
    ceiling = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=0.625, **kw))
    explicit = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(compact_rotated=0.25, **kw))
    hinted = ceiling.frame(params_g, image, params_c, image, calib=rot,
                           compact_hint=0.1)     # snaps to the 0.25 rung
    want = explicit.frame(params_g, image, params_c, image, calib=rot)
    for k in ("valid", "depth", "render_tex", "compact_dropped"):
        np.testing.assert_array_equal(np.asarray(want[k]),
                                      np.asarray(hinted[k]), err_msg=k)
    # frontal frames ignore the hint entirely (taps path, no compaction)
    eye = jnp.eye(4, dtype=jnp.float32)[None]
    f_base = ceiling.frame(params_g, image, params_c, image, calib=eye)
    f_hint = ceiling.frame(params_g, image, params_c, image, calib=eye,
                           compact_hint=0.1)
    np.testing.assert_array_equal(np.asarray(f_base["render_tex"]),
                                  np.asarray(f_hint["render_tex"]))


def test_compact_hint_from_valid_math():
    from tests.test_engine import _nets

    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, _ = _nets()
    eng = ReconEngine(netG,
              recon=HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048)),
              config=EngineCfg.flat(mode="ray", fine_res=257, ray_window=192))
    # valid fraction over the 257^2 lattice rescaled to the 192^2 window
    # (every valid pixel lies inside the subject-bbox window) + 1.3x
    hint = eng.compact_hint_from_valid(0.136)
    assert abs(hint - 0.136 * (257.0 / 192.0) ** 2 * 1.3) < 1e-9
    # no window -> the window IS the lattice
    eng2 = ReconEngine(netG,
               recon=HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048)),
               config=EngineCfg.flat(mode="ray", fine_res=257, ray_window=None))
    assert abs(eng2.compact_hint_from_valid(0.2) - 0.26) < 1e-9


def test_texture_reuses_refine_compaction():
    """tex_reuse_compact: the rotated texture query rides the FINAL refine
    level's compaction (ray_refine compact_state) instead of re-deriving
    window/valid/flatnonzero. Recon outputs must be BIT-identical (reuse
    only changes the texture stage), and on a stride-1 subject (fits the
    window at integer start) the rendered texture is bit-identical too:
    both paths query every valid pixel's color at the same world point
    (texture (r)-convention) and mask the rest."""
    import os

    import pytest

    from monoport_tpu.config import get_cfg_defaults
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.recon.hierarchy import HierarchicalRecon
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)
    from monoport_tpu.utils.params_io import load_params

    data = os.path.join(os.path.dirname(__file__), os.pardir,
                        "monoport_tpu", "data")
    pg = os.path.join(data, "netg_capsule.npz")
    pc = os.path.join(data, "netc_capsule.npz")
    if not (os.path.exists(pg) and os.path.exists(pc)):
        pytest.skip("committed capsule checkpoints absent")
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)
    params_g = {"params": load_params(pg)[0]}
    params_c = {"params": load_params(pc)[0]}

    # small body -> the refine/texture windows run at stride 1
    caps = skeleton3d(jax.random.PRNGKey(7), scale_range=(0.4, 0.45))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    recon = HierarchicalRecon(resolutions=(17, 33), budgets=(0, 4096),
                              select="uncertain")
    kw = dict(mode="ray", fine_res=65, ray_taps=6,
              ray_window=48, march_levels=(17, 33), compact_rotated=0.625)
    reuse = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(tex_reuse_compact=True, **kw))
    indep = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(tex_reuse_compact=False, **kw))
    out_r = reuse.frame(params_g, image, params_c, image, calib=rot)
    out_i = indep.frame(params_g, image, params_c, image, calib=rot)

    assert np.asarray(out_r["valid"]).sum() > 50   # the body is there
    for k in ("valid", "depth", "render_norm"):    # recon untouched
        np.testing.assert_array_equal(np.asarray(out_r[k]),
                                      np.asarray(out_i[k]), err_msg=k)
    # telemetry contract: 2 refine levels + texture, nothing dropped
    dropped = np.asarray(out_r["compact_dropped"])
    assert dropped.shape[0] == 3 and (dropped == 0).all(), dropped
    np.testing.assert_array_equal(
        np.asarray(out_r["render_tex"]), np.asarray(out_i["render_tex"]),
        err_msg="stride-1 texture must be bit-identical under reuse")


def test_texture_reuse_frontal_untouched():
    """tex_reuse_compact only engages on compacted rotated frames — the
    frontal grid texture is byte-identical with the flag on or off."""
    from tests.test_engine import _nets

    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, netC = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    eye = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, eye)
    params_c = netC.init(jax.random.PRNGKey(1), image, pts, eye,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))
    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=32, mode="ray", fine_res=33,
              ray_taps=4, march_levels=(9, 17), ray_window=24,
              rot_anchors=None, compact_rotated=0.625)
    on = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(tex_reuse_compact=True, **kw))
    off = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(tex_reuse_compact=False, **kw))
    o_on = on.frame(params_g, image, params_c, image, calib=eye)
    o_off = off.frame(params_g, image, params_c, image, calib=eye)
    np.testing.assert_array_equal(np.asarray(o_on["render_tex"]),
                                  np.asarray(o_off["render_tex"]))


def test_texture_stride_close_and_geometry_untouched():
    """texture.stride=2: the dense strided color lattice leaves geometry
    bit-identical, keeps the rendered texture close to the exact stride-1
    colors on the trained model (colors are smooth at the fine-pixel
    scale), and emits NO texture telemetry row (dense = nothing can
    drop). Frontal frames are byte-identical (grid path)."""
    import os

    import pytest

    from monoport_tpu.config import get_cfg_defaults
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.recon.hierarchy import HierarchicalRecon
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)
    from monoport_tpu.utils.params_io import load_params

    data = os.path.join(os.path.dirname(__file__), os.pardir,
                        "monoport_tpu", "data")
    pg = os.path.join(data, "netg_capsule.npz")
    pc = os.path.join(data, "netc_capsule.npz")
    if not (os.path.exists(pg) and os.path.exists(pc)):
        pytest.skip("committed capsule checkpoints absent")
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)
    params_g = {"params": load_params(pg)[0]}
    params_c = {"params": load_params(pc)[0]}

    caps = skeleton3d(jax.random.PRNGKey(7), scale_range=(0.4, 0.45))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    front = jnp.eye(4, dtype=jnp.float32)[None]
    recon = HierarchicalRecon(resolutions=(17, 33), budgets=(0, 4096),
                              select="uncertain")
    kw = dict(mode="ray", fine_res=65, ray_taps=6,
              ray_window=48, march_levels=(17, 33), compact_rotated=0.625)
    exact = ReconEngine(netG, netC, recon=recon,
                config=EngineCfg.flat(tex_stride=1, **kw))
    strided = ReconEngine(netG, netC, recon=recon,
                  config=EngineCfg.flat(tex_stride=2, **kw))
    out_e = exact.frame(params_g, image, params_c, image, calib=rot)
    out_s = strided.frame(params_g, image, params_c, image, calib=rot)

    assert np.asarray(out_e["valid"]).sum() > 50
    for k in ("valid", "depth", "render_norm"):    # geometry untouched
        np.testing.assert_array_equal(np.asarray(out_s[k]),
                                      np.asarray(out_e[k]), err_msg=k)
    # telemetry: refine rows only (no texture row), nothing dropped
    assert np.asarray(out_s["compact_dropped"]).shape[0] == 2
    assert (np.asarray(out_s["compact_dropped"]) == 0).all()
    # color closeness at valid pixels, [0,1] scale
    m = np.asarray(out_e["valid"]) > 0.5
    diff = np.abs(np.asarray(out_s["render_tex"])
                  - np.asarray(out_e["render_tex"]))
    # render_tex is the render_size canvas; cut to the subject via mask
    mask = np.asarray(out_e["mask"])
    mask = (mask[..., 0] if mask.ndim == 3 else mask) > 0.5
    assert m.sum() > 0 and mask.sum() > 0
    mad = float(diff[mask].mean())
    p99 = float(np.quantile(diff[mask], 0.99))
    assert mad < 0.02, mad
    assert p99 < 0.15, p99

    # frontal grid path byte-identical (stride only touches the rotated
    # per-point query)
    f_e = exact.frame(params_g, image, params_c, image, calib=front)
    f_s = strided.frame(params_g, image, params_c, image, calib=front)
    np.testing.assert_array_equal(np.asarray(f_s["render_tex"]),
                                  np.asarray(f_e["render_tex"]))
