"""Ray-structured fused sample+MLP (ops/pallas/fused_ray_mlp.py):
equivalence with the generic per-point query path.

The fine pass queries T z-taps per ray; under the flagship front-
orthographic calibration all taps share (x, y), so the gather and the
skip x-projections are shared per ray. These tests pin that the shared
formulation is arithmetically identical to the reference-parity per-point
path (monoport_net.query)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.models.heads import PIFuNetGMLP, PIFuNetCMLP
from monoport_tpu.ops.pallas.fused_ray_mlp import (apply_ray_packed,
                                                   apply_ray_xla,
                                                   pack_ray_mlp_params)


@pytest.mark.parametrize("factory,chans,last_op", [
    (PIFuNetGMLP, (257, 1024, 512, 256, 128, 1), "sigmoid"),
    (PIFuNetCMLP, (513, 1024, 512, 256, 128, 3), "tanh"),
])
def test_ray_mlp_matches_flax(factory, chans, last_op):
    net = factory()
    r, t = 40, 6
    c_f = chans[0] - 1
    feat = jax.random.normal(jax.random.PRNGKey(1), (1, r, c_f))
    z = jax.random.uniform(jax.random.PRNGKey(2), (1, r, t),
                           minval=-1.0, maxval=1.0)
    # expanded per-point input: same feature for every tap, z last
    x = jnp.concatenate([
        jnp.broadcast_to(feat[:, :, None], (1, r, t, c_f)),
        z[..., None]], axis=-1).reshape(1, r * t, chans[0])
    variables = net.init(jax.random.PRNGKey(0), x)
    want = np.asarray(net.apply(variables, x)).reshape(1, r, t, -1)

    packed = pack_ray_mlp_params(variables["params"], chans, jnp.float32)
    got_xla = np.asarray(apply_ray_xla(packed, feat, z, last_op,
                                       compute_dtype=jnp.float32))
    got_pl = np.asarray(apply_ray_packed(packed, feat, z, last_op,
                                         tile_r=64,
                                         compute_dtype=jnp.float32,
                                         interpret=True))
    np.testing.assert_allclose(got_xla, want, atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(got_pl, want, atol=2e-5, rtol=1e-4)


def test_query_taps_matches_query():
    """MonoPortNet.query_taps == query on the expanded batch, including a
    calibration whose z row mixes x/y (allowed; only z->xy mixing is not)."""
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
    net = MonoPortNet(opt)

    calib = jnp.asarray([[[0.9, 0.0, 0.0, 0.05],
                          [0.0, 1.1, 0.0, -0.02],
                          [0.2, -0.1, 0.95, 0.01],
                          [0.0, 0.0, 0.0, 1.0]]], jnp.float32)
    image = jnp.asarray(
        np.random.RandomState(0).rand(1, 64, 64, 3).astype(np.float32))
    r, t = 33, 5
    rng = np.random.RandomState(1)
    xy = jnp.asarray(rng.uniform(-1.2, 1.2, (1, r, 2)).astype(np.float32))
    z = jnp.asarray(rng.uniform(-1, 1, (1, r, t)).astype(np.float32))

    pts0 = jnp.concatenate([xy, z[..., :1]], -1)
    params = net.init(jax.random.PRNGKey(0), image, pts0, calib)
    feats = net.apply(params, image, method="filter")

    pts = jnp.concatenate([
        jnp.broadcast_to(xy[:, :, None], (1, r, t, 2)),
        z[..., None]], axis=-1).reshape(1, r * t, 3)
    want = np.asarray(net.apply(params, feats, pts, calib,
                                method="query")[0]).reshape(1, r, t, 1)
    got = np.asarray(net.apply(params, feats, xy, z, calib,
                               method="query_taps"))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)

    # with the packed ray head (the engine's fast path)
    packed = pack_ray_mlp_params(
        params["params"]["surface_classifier"],
        (257, 1024, 512, 256, 128, 1), jnp.float32)
    import functools
    head = functools.partial(apply_ray_xla, packed, last_op="sigmoid",
                             compute_dtype=jnp.float32)
    got2 = np.asarray(net.apply(params, feats, xy, z, calib,
                                method="query_taps", head_taps_fn=head))
    np.testing.assert_allclose(got2, want, atol=3e-5, rtol=1e-4)


def test_engine_ray_query_equivalent():
    """Engine frame with use_ray_query on/off: identical surface maps."""
    from tests.test_engine import _nets
    from monoport_tpu.engine import EngineCfg
    from monoport_tpu.engine import ReconEngine
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    netG, _ = _nets()
    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32))
    pts = jnp.zeros((1, 64, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)

    recon = HierarchicalRecon(resolutions=(9, 17), budgets=(0, 2048))
    kw = dict(recon=recon, render_size=64, mode="ray", fine_res=33,
              ray_taps=5)
    eng_a = ReconEngine(netG, recon=recon,
                config=EngineCfg.flat(render_size=64, mode="ray", fine_res=33,
                                      ray_taps=5, use_ray_query=False))
    eng_b = ReconEngine(netG, recon=recon,
                config=EngineCfg.flat(render_size=64, mode="ray", fine_res=33,
                                      ray_taps=5, use_ray_query=True))
    out_a = eng_a.frame(params_g, image, calib=calib)
    out_b = eng_b.frame(params_g, image, calib=calib)
    np.testing.assert_allclose(np.asarray(out_b["depth"]),
                               np.asarray(out_a["depth"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out_b["render_norm"]),
                               np.asarray(out_a["render_norm"]), atol=2e-3)
