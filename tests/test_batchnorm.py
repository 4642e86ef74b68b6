"""Train-mode BatchNorm through the training stack (norm='batch_train').

The reference's HRNet/Yolov4 default to BatchNorm (HRNetFilters.py:10);
round 1 only supported inference-mode running stats. These tests pin:
batch statistics are used in the forward, running stats update through
the (scan) train step, checkpoints round-trip them, and eval_net switches
to running averages."""

import numpy as np

import jax
import jax.numpy as jnp

from monoport_tpu.config import CN
from monoport_tpu.models import MonoPortNet
from monoport_tpu.models.monoport_net import eval_net
from monoport_tpu.parallel.train_step import (create_train_state,
                                              make_optimizer,
                                              make_train_step)


def _bn_net():
    opt = CN()
    opt.projection = "orthogonal"
    opt.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                       "num_hourglass": 1, "hourglass_dim": 64,
                       "norm": "batch_train", "hg_down": "ave_pool"})
    opt.normalizer = CN({"IMF": "PIFuNomalizer"})
    opt.head = CN({"IMF": "PIFuNetGMLP"})
    opt.loss = CN({"IMF": "MSE"})
    return MonoPortNet(opt)


def _batch(rng, b=2, s=32, n=64):
    return {"images": jnp.asarray(rng.rand(b, s, s, 3), jnp.float32),
            "points": jnp.asarray(rng.uniform(-1, 1, (b, n, 3)), jnp.float32),
            "calibs": jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                               (b, 1, 1)),
            "labels": jnp.asarray(rng.rand(b, n, 1) > 0.5, jnp.float32)}


def test_bn_train_step_updates_stats():
    net = _bn_net()
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(net, jax.random.PRNGKey(0), batch, tx)
    assert state.batch_stats is not None
    stats0 = jax.tree.map(np.asarray, state.batch_stats)

    step = make_train_step(net)
    losses = []
    for i in range(3):
        state, loss = step(state, _batch(np.random.RandomState(i + 1)))
        losses.append(float(loss))
    stats1 = jax.tree.map(np.asarray, state.batch_stats)

    moved = [float(np.abs(a - b).max())
             for a, b in zip(jax.tree.leaves(stats0), jax.tree.leaves(stats1))]
    assert max(moved) > 1e-4, "running stats never updated"
    assert np.isfinite(losses).all()


def test_bn_eval_variant_uses_running_stats():
    net = _bn_net()
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    variables = net.init(jax.random.PRNGKey(0), batch["images"],
                         batch["points"], batch["calibs"],
                         labels=batch["labels"], train=True)
    enet = eval_net(net)
    assert enet is not net

    # eval net must run WITHOUT mutability and with batch-size-independent
    # output: a 1-item slice equals the same item in a 2-item batch
    full = enet.apply(variables, batch["images"], batch["points"],
                      batch["calibs"])
    one = enet.apply(variables, batch["images"][:1], batch["points"][:1],
                     batch["calibs"][:1])
    np.testing.assert_allclose(np.asarray(one[0]), np.asarray(full[0]),
                               atol=1e-5)

    # train-mode forward differs (batch statistics, not running averages)
    (train_out, _), _ = net.apply(variables, batch["images"],
                                  batch["points"], batch["calibs"],
                                  labels=batch["labels"], train=True,
                                  mutable=["batch_stats"])
    assert float(np.abs(np.asarray(train_out)
                        - np.asarray(full[0])).max()) > 1e-4


def test_bn_scan_step_and_group_net_unaffected():
    """scan train step threads stats; group-norm nets keep batch_stats=None."""
    from monoport_tpu.parallel.train_step import make_scan_train_step

    net = _bn_net()
    rng = np.random.RandomState(0)
    batch = _batch(rng)
    tx = make_optimizer("adam", 1e-3)
    state = create_train_state(net, jax.random.PRNGKey(0), batch, tx)
    stacked = jax.tree.map(
        lambda *xs: jnp.stack(xs),
        *[_batch(np.random.RandomState(i)) for i in range(2)])
    scan_step = make_scan_train_step(net)
    stats0 = jax.tree.map(np.asarray, state.batch_stats)  # donated below
    state2, losses = scan_step(state, stacked)
    assert losses.shape == (2,)
    moved = [float(np.abs(a - np.asarray(b)).max())
             for a, b in zip(jax.tree.leaves(stats0),
                             jax.tree.leaves(state2.batch_stats))]
    assert max(moved) > 1e-4

    gopt = CN()
    gopt.projection = "orthogonal"
    gopt.backbone = CN({"IMF": "PIFuHGFilters", "num_stack": 1,
                        "num_hourglass": 1, "hourglass_dim": 64,
                        "norm": "group", "hg_down": "ave_pool"})
    gopt.normalizer = CN({"IMF": "PIFuNomalizer"})
    gopt.head = CN({"IMF": "PIFuNetGMLP"})
    gopt.loss = CN({"IMF": "MSE"})
    gnet = MonoPortNet(gopt)
    gstate = create_train_state(gnet, jax.random.PRNGKey(0), batch, tx)
    assert gstate.batch_stats is None
    assert eval_net(gnet) is gnet
