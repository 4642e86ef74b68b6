"""Multi-device sharding tests on the 8-virtual-CPU mesh (SURVEY §2.2:
DP via batch sharding replaces nn.DataParallel; the point axis is the
SP-like sharded axis of this workload)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.config import CN
from monoport_tpu.models import MonoPortNet
from monoport_tpu.parallel import (batch_sharding, create_train_state,
                                   make_mesh, make_train_step, replicated)
from monoport_tpu.parallel.train_step import make_optimizer


def _small_netG():
    opt = CN()
    opt.projection = "orthogonal"
    opt.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                       "num_hourglass": 1, "hourglass_dim": 64,
                       "norm": "group", "hg_down": "ave_pool"})
    opt.normalizer = CN({"IMF": "PIFuNomalizer", "soft_onehot": False,
                         "soft_dim": 64})
    opt.head = CN({"IMF": "small_head"})
    opt.loss = CN({"IMF": "MSE"})
    from monoport_tpu.models.heads import HEADS
    from monoport_tpu.models.heads.surface_classifier import SurfaceClassifier
    HEADS.setdefault("small_head", lambda o=None, name=None: SurfaceClassifier(
        filter_channels=(65, 32, 1), num_views=1, no_residual=False,
        last_op=jax.nn.sigmoid, name=name))
    return MonoPortNet(opt)


def _batch(b=4, n=128, hw=64):
    rng = np.random.RandomState(0)
    return {
        "images": jnp.asarray(rng.rand(b, hw, hw, 3).astype(np.float32)),
        "points": jnp.asarray(
            rng.uniform(-1, 1, (b, n, 3)).astype(np.float32)),
        "calibs": jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1)),
        "labels": jnp.asarray(
            (rng.rand(b, n, 1) > 0.5).astype(np.float32)),
    }


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["points"] == 8
    mesh2 = make_mesh(8, dp=8)
    assert mesh2.shape["data"] == 8


def test_sharded_train_step_matches_single_device():
    net = _small_netG()
    batch = _batch()
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(net, jax.random.PRNGKey(0), batch, tx)

    single = make_train_step(net, mesh=None)
    s1, loss1 = single(state, batch)

    mesh = make_mesh(8, dp=4)
    state2 = create_train_state(net, jax.random.PRNGKey(0), batch, tx)
    sharded = make_train_step(net, mesh=mesh)
    s2, loss2 = sharded(state2, batch)

    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-6)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        # cross-device psum reduction order differs from the single-device
        # sum; Adam's 1/sqrt(v) amplifies that for near-zero grads
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-3)


def test_sharded_query_point_axis():
    """Eval-time point-axis sharding: replicated feats, sharded points."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    net = _small_netG()
    batch = _batch(b=1, n=1024)
    variables = net.init(jax.random.PRNGKey(0), batch["images"],
                         batch["points"], batch["calibs"])
    mesh = make_mesh(8, dp=1)

    feats = net.apply(variables, batch["images"], method="filter")
    pts_sharded = jax.device_put(
        batch["points"], NamedSharding(mesh, P(None, "points")))

    query = jax.jit(lambda f, p, c: net.apply(variables, f, p, c,
                                              method="query")[0])
    got = query(feats, pts_sharded, batch["calibs"])
    want = net.apply(variables, feats, batch["points"], batch["calibs"],
                     method="query")[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)
