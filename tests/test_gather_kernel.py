"""In-kernel bilinear gather + MLP (ops/pallas/fused_gather_mlp):
interpret-mode equivalence against the XLA reference composition
(jnp gather + apply_ray_xla) and against the pre-gathered ray kernel."""

import numpy as np

import jax
import jax.numpy as jnp

from monoport_tpu.ops.pallas.fused_gather_mlp import (_bilinear_taps,
                                                      apply_gather_ray_packed,
                                                      apply_gather_xla)
from monoport_tpu.ops.pallas.fused_ray_mlp import (apply_ray_xla,
                                                   pack_ray_mlp_params)
from monoport_tpu.ops.sampling import index


def _head_params(rng, chans):
    p = {}
    c_in = chans[0]
    for i in range(len(chans) - 1):
        fan_in = c_in if i == 0 else chans[i] + c_in
        p[f"filters_{i}"] = {
            "kernel": jnp.asarray(rng.randn(fan_in, chans[i + 1]) * 0.2,
                                  jnp.float32),
            "bias": jnp.asarray(rng.randn(chans[i + 1]) * 0.1, jnp.float32),
        }
    return p


def test_bilinear_taps_match_index():
    """_bilinear_taps' (idx, wgt) reproduce ops/sampling.index exactly,
    including zeros padding at partially-out-of-image points."""
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 9, 11, 5).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1.3, 1.3, (1, 64, 2)).astype(np.float32))
    idx, wgt = _bilinear_taps(uv, 9, 11)
    table = feat.reshape(1, 99, 5)
    rows = jnp.take_along_axis(table, idx.reshape(1, -1)[..., None],
                               axis=1).reshape(1, 64, 4, 5)
    got = (rows * wgt[..., None]).sum(axis=2)
    want = index(feat, uv)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_gather_kernel_matches_xla_reference():
    rng = np.random.RandomState(1)
    chans = (33, 64, 32, 1)           # c_f = 32
    params = _head_params(rng, chans)
    packed = pack_ray_mlp_params(params, chans, dtype=jnp.float32)

    h, w, c = 12, 10, 32
    feat_map = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32) * 0.3)
    r, taps = 70, 3
    uv = jnp.asarray(rng.uniform(-1.1, 1.1, (1, r, 2)).astype(np.float32))
    z = jnp.asarray(rng.randn(1, r, taps).astype(np.float32) * 0.5)

    got = apply_gather_ray_packed(packed, feat_map, uv, z, "sigmoid",
                                  tile_r=32, compute_dtype=jnp.float32,
                                  interpret=True)
    want = apply_gather_xla(packed, feat_map, uv, z, "sigmoid",
                            compute_dtype=jnp.float32)
    assert got.shape == (1, r, taps, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gather_kernel_matches_pregathered_ray_kernel():
    """Same math as index() -> apply_ray_xla on in-image points (the
    pre-gathered path the engine ships)."""
    rng = np.random.RandomState(2)
    chans = (17, 48, 24, 1)           # c_f = 16
    params = _head_params(rng, chans)
    packed = pack_ray_mlp_params(params, chans, dtype=jnp.float32)

    h, w, c = 8, 8, 16
    feat_map = jnp.asarray(rng.randn(1, h, w, c).astype(np.float32) * 0.3)
    r, taps = 40, 2
    uv = jnp.asarray(rng.uniform(-0.9, 0.9, (1, r, 2)).astype(np.float32))
    z = jnp.asarray(rng.randn(1, r, taps).astype(np.float32) * 0.5)

    got = apply_gather_ray_packed(packed, feat_map, uv, z, "sigmoid",
                                  tile_r=16, compute_dtype=jnp.float32,
                                  interpret=True)
    feat = index(feat_map, uv)
    want = apply_ray_xla(packed, feat, z, "sigmoid",
                         compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_gather_kernel_per_point_taps1():
    """T=1 is the per-point query shape (rotated-view frames)."""
    rng = np.random.RandomState(3)
    chans = (17, 32, 1)
    params = _head_params(rng, chans)
    packed = pack_ray_mlp_params(params, chans, dtype=jnp.float32)
    feat_map = jnp.asarray(rng.randn(1, 6, 6, 16).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1, 1, (1, 33, 2)).astype(np.float32))
    z = jnp.asarray(rng.randn(1, 33, 1).astype(np.float32))
    got = apply_gather_ray_packed(packed, feat_map, uv, z, "sigmoid",
                                  tile_r=16, compute_dtype=jnp.float32,
                                  interpret=True)
    want = apply_gather_xla(packed, feat_map, uv, z, "sigmoid",
                            compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
