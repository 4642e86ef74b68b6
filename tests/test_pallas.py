"""Pallas fused-MLP kernel: equivalence with the flax SurfaceClassifier
(interpret mode on CPU; the real-chip path is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.models.heads import PIFuNetGMLP, PIFuNetCMLP
from monoport_tpu.ops.pallas import PallasSurfaceMLP


@pytest.mark.parametrize("factory,chans,last_op", [
    (PIFuNetGMLP, (257, 1024, 512, 256, 128, 1), "sigmoid"),
    (PIFuNetCMLP, (513, 1024, 512, 256, 128, 3), "tanh"),
])
def test_pallas_mlp_matches_flax(factory, chans, last_op):
    net = factory()
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 700, chans[0]),
                          jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    want = np.asarray(net.apply(variables, x))

    kernel = PallasSurfaceMLP(variables["params"], chans, last_op,
                              tile_n=256, compute_dtype=jnp.float32,
                              interpret=True)
    got = np.asarray(kernel(x))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_pallas_mlp_bf16_close():
    net = PIFuNetGMLP()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 300, 257), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    want = np.asarray(net.apply(variables, x))
    kernel = PallasSurfaceMLP(variables["params"],
                              (257, 1024, 512, 256, 128, 1), "sigmoid",
                              tile_n=128, compute_dtype=jnp.bfloat16,
                              interpret=True)
    got = np.asarray(kernel(x))
    # bf16 compute with fp32 accumulation through a sigmoid: ~1e-2
    np.testing.assert_allclose(got, want, atol=2e-2)
    assert abs(got.mean() - want.mean()) < 2e-3
