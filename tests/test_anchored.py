"""Anchored ray query (rotated-view fast path): equivalence structure.

Under ANY affine calib the projected (u, v, zc) of a march ray's z-taps is
linear in z (monoport_net.query_taps_anchored). The anchored path gathers
features at K anchor points on that uv segment and reconstructs per-tap
features by piecewise lerp; its geometry (uv, zc, in-image mask) is exact,
and the feature lerp is exact whenever the bilinear sample is linear
across the segment. These tests pin:
  * the anchored MLP (apply_anchor_xla / apply_anchor_packed) against the
    flax head on hat-weight-combined features — exact by construction;
  * anchored == per-point query EXACTLY on linear feature maps (bilinear
    sampling reproduces linear functions, so the lerp is lossless);
  * anchored == query_taps on frontal calibs (zero-length uv segments);
  * the compacted refine with a taps fn == the dense taps refine on the
    queried rays.
"""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.models.heads import PIFuNetGMLP
from monoport_tpu.ops.pallas.fused_ray_mlp import (apply_anchor_packed,
                                                   apply_anchor_xla,
                                                   pack_ray_mlp_params)

CHANS = (257, 1024, 512, 256, 128, 1)

# rotated view calib: z terms in BOTH image rows (orbit camera shape,
# RTL/scene.py:122-137) plus an x/y-mixing z row
ROT_CALIB = jnp.asarray([[[0.93, 0.02, 0.30, 0.05],
                          [-0.05, 0.99, 0.17, -0.02],
                          [0.24, -0.12, 0.92, 0.01],
                          [0.0, 0.0, 0.0, 1.0]]], jnp.float32)


def _hat_weights(alpha, k):
    pos = alpha[..., None] * (k - 1) - jnp.arange(k, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(pos))


@pytest.mark.parametrize("k", [2, 3])
def test_anchor_mlp_matches_flax(k):
    """apply_anchor_xla / apply_anchor_packed == the flax head applied to
    the hat-weight-combined per-tap features (exact by construction)."""
    net = PIFuNetGMLP()
    r, t = 40, 6
    c_f = CHANS[0] - 1
    key = jax.random.PRNGKey(1)
    feat_k = jax.random.normal(key, (1, r, k, c_f))
    alpha = jnp.sort(jax.random.uniform(jax.random.PRNGKey(2), (1, r, t)),
                     axis=-1)
    w = _hat_weights(alpha, k)                            # [1, r, t, k]
    z = jax.random.uniform(jax.random.PRNGKey(3), (1, r, t),
                           minval=-1.0, maxval=1.0)

    feat_t = jnp.einsum("brtk,brkc->brtc", w, feat_k)
    x = jnp.concatenate([feat_t, z[..., None]],
                        axis=-1).reshape(1, r * t, CHANS[0])
    variables = net.init(jax.random.PRNGKey(0), x)
    want = np.asarray(net.apply(variables, x)).reshape(1, r, t, -1)

    packed = pack_ray_mlp_params(variables["params"], CHANS, jnp.float32)
    got_xla = np.asarray(apply_anchor_xla(packed, feat_k, w, z, "sigmoid",
                                          compute_dtype=jnp.float32))
    got_pl = np.asarray(apply_anchor_packed(packed, feat_k, w, z, "sigmoid",
                                            tile_r=64,
                                            compute_dtype=jnp.float32,
                                            interpret=True))
    np.testing.assert_allclose(got_xla, want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got_pl, want, atol=2e-5, rtol=1e-4)


def _linear_feats(h, w, c, seed=0):
    """[1, h, w, c] feature map LINEAR in (u, v): bilinear sampling (and
    hence the anchored lerp) is exact on it."""
    rng = np.random.RandomState(seed)
    a = rng.randn(c).astype(np.float32)
    b = rng.randn(c).astype(np.float32)
    d = rng.randn(c).astype(np.float32)
    u = np.linspace(-1, 1, w, dtype=np.float32)[None, :, None]
    v = np.linspace(-1, 1, h, dtype=np.float32)[:, None, None]
    return jnp.asarray((a * u + b * v + d)[None])


def _small_net():
    from monoport_tpu.config import CN
    from monoport_tpu.models import MonoPortNet

    opt = CN()
    opt.projection = "orthogonal"
    opt.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                       "num_hourglass": 1, "hourglass_dim": 256,
                       "norm": "group", "hg_down": "ave_pool"})
    opt.normalizer = CN({"IMF": "PIFuNomalizer"})
    opt.head = CN({"IMF": "PIFuNetGMLP"})
    opt.loss = CN({"IMF": "MSE"})
    return MonoPortNet(opt)


@pytest.mark.parametrize("k", [2, 3])
def test_anchored_linear_features_exact(k):
    """On linear feature maps, anchored == the per-point query EXACTLY
    (geometry is exact; the feature lerp is lossless on linear fields),
    under a fully rotated calib."""
    net = _small_net()
    image = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    r, t = 37, 6
    rng = np.random.RandomState(1)
    # keep every projected tap strictly inside the image so zeros-padding
    # (which breaks linearity at the border) never engages
    xy = jnp.asarray(rng.uniform(-0.45, 0.45, (1, r, 2)).astype(np.float32))
    z0 = rng.uniform(-0.4, 0.1, (1, r, 1)).astype(np.float32)
    z = jnp.asarray(z0 + np.linspace(0, 0.3, t, dtype=np.float32))

    pts0 = jnp.concatenate([xy, z[..., :1]], -1)
    params = net.init(jax.random.PRNGKey(0), image, pts0, ROT_CALIB)
    feats = [[_linear_feats(64, 64, 256)]]

    pts = jnp.concatenate([
        jnp.broadcast_to(xy[:, :, None], (1, r, t, 2)),
        z[..., None]], axis=-1).reshape(1, r * t, 3)
    want = np.asarray(net.apply(params, feats, pts, ROT_CALIB,
                                method="query")[0]).reshape(1, r, t, 1)
    got = np.asarray(net.apply(params, feats, xy, z, ROT_CALIB,
                               method="query_taps_anchored", anchors=k))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    # with the packed anchored head (the engine's fast path)
    packed = pack_ray_mlp_params(params["params"]["surface_classifier"],
                                 CHANS, jnp.float32)
    head = functools.partial(apply_anchor_xla, packed, last_op="sigmoid",
                             compute_dtype=jnp.float32)
    got2 = np.asarray(net.apply(params, feats, xy, z, ROT_CALIB,
                                method="query_taps_anchored", anchors=k,
                                head_anchor_fn=head))
    np.testing.assert_allclose(got2, want, atol=3e-5, rtol=1e-4)


def test_anchored_frontal_equals_query_taps():
    """Frontal calib (z-free image rows): the uv segment degenerates to a
    point, so anchored == query_taps for ANY (nonlinear) features."""
    net = _small_net()
    calib = jnp.asarray([[[0.9, 0.0, 0.0, 0.05],
                          [0.0, 1.1, 0.0, -0.02],
                          [0.2, -0.1, 0.95, 0.01],
                          [0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    image = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    r, t = 33, 5
    rng = np.random.RandomState(1)
    xy = jnp.asarray(rng.uniform(-1.2, 1.2, (1, r, 2)).astype(np.float32))
    z = jnp.asarray(np.sort(rng.uniform(-1, 1, (1, r, t)), axis=-1)
                    .astype(np.float32))

    pts0 = jnp.concatenate([xy, z[..., :1]], -1)
    params = net.init(jax.random.PRNGKey(0), image, pts0, calib)
    feats = net.apply(params, image, method="filter")
    want = np.asarray(net.apply(params, feats, xy, z, calib,
                                method="query_taps"))
    got = np.asarray(net.apply(params, feats, xy, z, calib,
                               method="query_taps_anchored", anchors=2))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_refine_compact_taps_matches_dense():
    """_refine_core with a taps fn: the compacted path (budget covering
    every valid ray) == the dense taps path on the queried rays."""
    from monoport_tpu.recon.ray_refine import _refine_core

    rf, taps = 65, 5
    h = w = 21
    rng = np.random.RandomState(3)
    depth_f = jnp.asarray(rng.uniform(5, 50, (h, w)).astype(np.float32))
    valid_f = jnp.asarray(rng.rand(h, w) > 0.45)
    ax = jnp.linspace(0, rf - 1, h)
    by = jnp.linspace(0, rf - 1, w)

    def query_taps_fn(xy, wz):                     # analytic occupancy
        d = jnp.linalg.norm(xy, axis=-1)[..., None]          # [1, R, 1]
        return jax.nn.sigmoid((0.6 - d - 0.3 * wz) * 8.0)    # [1, R, T]

    def query_fn(pts):                             # same field, per-point
        d = jnp.linalg.norm(pts[..., :2], axis=-1)
        return jax.nn.sigmoid((0.6 - d - 0.3 * pts[..., 2]) * 8.0)[..., None]

    kw = dict(rf=rf, taps=taps, scale=2.0, balance_value=0.5,
              b_min=(-1, -1, -1), b_max=(1, 1, 1))
    dense = _refine_core(query_fn, depth_f, valid_f, ax, by,
                         query_taps_fn=query_taps_fn, **kw)
    budget = int(-(-int(np.asarray(valid_f).sum()) // 256) * 256)
    comp = _refine_core(query_fn, depth_f, valid_f, ax, by,
                        query_taps_fn=query_taps_fn,
                        compact_budget=budget, **kw)
    v = np.asarray(valid_f)
    np.testing.assert_allclose(np.asarray(comp.depth)[v],
                               np.asarray(dense.depth)[v], atol=1e-5)
    np.testing.assert_array_equal(np.asarray(comp.valid)[v],
                                  np.asarray(dense.valid)[v])


def test_engine_rotated_anchored_close_to_per_point():
    """Engine-level: a rotated-calib frame with the anchored refine tracks
    the exact per-point refine on a smooth random model."""
    from tests.test_engine import _nets
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, _ = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, ROT_CALIB)

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=64, mode="ray", fine_res=33,
              ray_taps=5, march_levels=(9, 17), compact_rotated=0.75)
    eng_pp = ReconEngine(netG, recon=recon,
                config=EngineCfg.flat(rot_anchors=None, **kw))
    eng_an = ReconEngine(netG, recon=recon,
                config=EngineCfg.flat(rot_anchors=2, **kw))
    out_pp = eng_pp.frame(params_g, image, calib=ROT_CALIB)
    out_an = eng_an.frame(params_g, image, calib=ROT_CALIB)
    v_pp = np.asarray(out_pp["valid"])
    v_an = np.asarray(out_an["valid"])
    union = (v_pp | v_an).sum()
    if union:
        iou = (v_pp & v_an).sum() / union
        assert iou > 0.9, iou
    both = v_pp & v_an
    if both.any():
        dd = np.abs(np.asarray(out_pp["depth"])
                    - np.asarray(out_an["depth"]))[both]
        assert float(np.median(dd)) < 0.5, float(np.median(dd))


def test_frames_mixed_calib_groups_match_per_frame():
    """frames() on a mixed frontal/rotated clip: per-frame grouping keeps
    each frame's own fast path and reassembles outputs in clip order —
    every frame equals its individual frame() call (VERDICT r3 item 4)."""
    from tests.test_engine import _nets
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, _ = _nets()
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(3, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    front = jnp.eye(4, dtype=jnp.float32)
    calibs = jnp.stack([front, ROT_CALIB[0], front])
    params_g = netG.init(jax.random.PRNGKey(0), images[:1], pts,
                         calibs[:1])

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    eng = ReconEngine(netG, recon=recon,
              config=EngineCfg.flat(render_size=32, mode="ray", fine_res=33,
                                    ray_taps=4, march_levels=(9, 17),
                                    compact_rotated=0.75))
    outs = eng.frames(params_g, images, calibs=calibs)
    assert outs["depth"].shape == (3, 33, 33)
    for i in range(3):
        want = eng.frame(params_g, images[i][None],
                         calib=calibs[i][None])
        np.testing.assert_allclose(np.asarray(outs["depth"][i]),
                                   np.asarray(want["depth"]), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(outs["valid"][i]),
                                      np.asarray(want["valid"]))


# -- perspective (r4: VERDICT r3 item 7) ------------------------------------

def _persp_net():
    from monoport_tpu.config import CN
    from monoport_tpu.models import MonoPortNet

    opt = CN()
    opt.projection = "perspective"
    opt.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                       "num_hourglass": 1, "hourglass_dim": 256,
                       "norm": "group", "hg_down": "ave_pool"})
    opt.normalizer = CN({"IMF": "PIFuNomalizer"})
    opt.head = CN({"IMF": "PIFuNetGMLP"})
    opt.loss = CN({"IMF": "MSE"})
    return MonoPortNet(opt)


# camera 3 units in front of the volume: homo z stays in [2, 4] so the
# z-divide is well conditioned (geometry.py:37-55 convention)
PERSP_CALIB = jnp.asarray([[[0.9, 0.02, 0.05, 0.02],
                            [-0.03, 1.05, 0.08, -0.01],
                            [0.1, -0.05, 1.0, 3.0],
                            [0.0, 0.0, 0.0, 1.0]]], jnp.float32)


@pytest.mark.parametrize("k", [2, 3])
def test_anchored_perspective_linear_exact(k):
    """Perspective net: a ray's uv path is a straight chord (projective
    image of a line) with rational parameterization; the anchored query
    computes per-tap alpha from EXACT projections, so on linear feature
    maps it equals the per-point query exactly."""
    net = _persp_net()
    image = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    r, t = 29, 6
    rng = np.random.RandomState(1)
    xy = jnp.asarray(rng.uniform(-0.4, 0.4, (1, r, 2)).astype(np.float32))
    z0 = rng.uniform(-0.4, 0.1, (1, r, 1)).astype(np.float32)
    z = jnp.asarray(z0 + np.linspace(0, 0.3, t, dtype=np.float32))

    pts0 = jnp.concatenate([xy, z[..., :1]], -1)
    params = net.init(jax.random.PRNGKey(0), image, pts0, PERSP_CALIB)
    feats = [[_linear_feats(64, 64, 256)]]

    pts = jnp.concatenate([
        jnp.broadcast_to(xy[:, :, None], (1, r, t, 2)),
        z[..., None]], axis=-1).reshape(1, r * t, 3)
    want = np.asarray(net.apply(params, feats, pts, PERSP_CALIB,
                                method="query")[0]).reshape(1, r, t, 1)
    got = np.asarray(net.apply(params, feats, xy, z, PERSP_CALIB,
                               method="query_taps_anchored", anchors=k))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_engine_perspective_rides_anchored_march():
    """A perspective-config engine never claims the taps path (the
    z-divide moves uv along every ray, any calib), gets a finite anchor
    plan, and its anchored march frame tracks the exact per-point frame —
    perspective is a first-class fast-path citizen now, not a hierarchy
    fallback (reference geometry.py:37-55)."""
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG = _persp_net()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, PERSP_CALIB)

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(render_size=64, mode="ray", fine_res=33,
              ray_taps=5, march_levels=(9, 17), compact_rotated=0.75)
    eng_pp = ReconEngine(netG, recon=recon,
                config=EngineCfg.flat(rot_anchors=None, **kw))
    eng_an = ReconEngine(netG, recon=recon,
                config=EngineCfg.flat(rot_anchors=2, **kw))
    assert not eng_an._calib_taps_ok(PERSP_CALIB)
    assert not eng_an._calib_taps_ok(jnp.eye(4, dtype=jnp.float32)[None])
    plan = eng_an._rot_anchor_plan(PERSP_CALIB, 64)
    assert len(plan) == 2
    out_pp = eng_pp.frame(params_g, image, calib=PERSP_CALIB)
    out_an = eng_an.frame(params_g, image, calib=PERSP_CALIB)
    v_pp = np.asarray(out_pp["valid"])
    v_an = np.asarray(out_an["valid"])
    union = (v_pp | v_an).sum()
    if union:
        iou = (v_pp & v_an).sum() / union
        assert iou > 0.9, iou
    both = v_pp & v_an
    if both.any():
        dd = np.abs(np.asarray(out_pp["depth"])
                    - np.asarray(out_an["depth"]))[both]
        assert float(np.median(dd)) < 0.5, float(np.median(dd))
