"""Sharded training step (functional; used by training.Trainer and the
multichip dry-run).

One jitted program: forward (all supervision stages, MonoPortNet.py:63 train
path) -> multi-stage loss (MonoPortNet.py:93-117) -> grad -> optax update.
Sharding in/out specs come from parallel.mesh; XLA inserts the gradient
psum across the mesh (the TPU equivalent of nn.DataParallel's gather,
common/trainer.py:15).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct

from .mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    batch_stats: Any = None  # BN running stats (norm='batch_train' nets)

    def apply_gradients(self, grads):
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(step=self.step + 1,
                            params=optax.apply_updates(self.params, updates),
                            opt_state=new_opt)


def make_optimizer(optim: str = "RMSprop", learning_rate: float = 1e-3,
                   weight_decay: float = 0.0, momentum: float = 0.0,
                   schedule: tuple = (), gamma: float = 0.1,
                   grad_clip: float = 0.0):
    """Optimizer + MultiStepLR-style schedule (common/trainer.py:36-56).

    ``schedule`` milestones are in *steps* here (the reference schedules on
    epochs; Trainer converts) with decay factor ``gamma``. ``grad_clip``
    prepends a global-norm clip (cfg.grad_clip; netC needs it, see
    config.py).
    """
    if schedule:
        lr = optax.piecewise_constant_schedule(
            learning_rate, {int(m): gamma for m in schedule})
    else:
        lr = learning_rate
    name = optim.lower()
    if name == "adadelta":
        tx = optax.adadelta(lr, weight_decay=weight_decay)
    elif name == "sgd":
        tx = optax.sgd(lr, momentum=momentum or None)
    elif name == "adam":
        tx = optax.adam(lr)
    elif name == "rmsprop":
        tx = optax.rmsprop(lr, momentum=momentum)
    else:
        raise NotImplementedError(optim)
    if weight_decay and name in ("sgd", "adam", "rmsprop"):
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def create_train_state(net, rng, example_batch, tx) -> TrainState:
    variables = net.init(rng, example_batch["images"],
                         example_batch["points"], example_batch["calibs"],
                         labels=example_batch["labels"],
                         feat_prior=example_batch.get("feat_prior"),
                         train=True)
    return TrainState(step=jnp.zeros((), jnp.int32),
                      params=variables["params"], opt_state=tx.init(
                          variables["params"]), tx=tx,
                      batch_stats=variables.get("batch_stats"))


def _make_loss_fn(net) -> Callable:
    """(params, batch_stats|None, batch) -> (loss, new_batch_stats|None).

    With batch_stats (norm='batch_train'), the forward runs training-mode
    BN and returns the updated running stats; the batch-mean reduction is
    global across any data-parallel sharding (jit inserts the collective).

    A batch may carry 'feat_prior' (netC training: the frozen netG's last
    feature stage, MonoPortNet.py:187-208 — computed outside this step so
    the geometry net takes no gradients); its presence is part of the
    batch's pytree structure, so each variant traces its own program."""

    def loss_fn(params, batch_stats, batch):
        prior = batch.get("feat_prior")
        if batch_stats is None:
            _, loss = net.apply({"params": params}, batch["images"],
                                batch["points"], batch["calibs"],
                                labels=batch["labels"], feat_prior=prior,
                                train=True)
            return loss, None
        (_, loss), new_vars = net.apply(
            {"params": params, "batch_stats": batch_stats},
            batch["images"], batch["points"], batch["calibs"],
            labels=batch["labels"], feat_prior=prior,
            train=True, mutable=["batch_stats"])
        return loss, new_vars["batch_stats"]

    return loss_fn


def _step_body(loss_fn, state: TrainState, batch):
    (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params, state.batch_stats, batch)
    state = state.apply_gradients(grads)
    if new_stats is not None:
        state = state.replace(batch_stats=new_stats)
    return state, loss


def make_train_step(net, mesh=None) -> Callable:
    """Build the jitted train step; with a mesh, shard batch/state."""
    loss_fn = _make_loss_fn(net)

    def step_fn(state: TrainState, batch) -> tuple[TrainState, jax.Array]:
        return _step_body(loss_fn, state, batch)

    if mesh is None:
        return jax.jit(step_fn, donate_argnums=0)

    rep = replicated(mesh)
    bs_all = batch_sharding(mesh)
    # prefix-pytree shardings: replicated state, sharded batch dict. The
    # batch spec is restricted to the keys actually present (a netG batch
    # has no 'feat_prior'; pjit prefix dicts must match keys exactly), one
    # jitted variant per batch structure.
    cache: dict = {}

    def stepper(state: TrainState, batch):
        key = tuple(sorted(batch))
        if key not in cache:
            bs = {k: bs_all[k] for k in batch}
            cache[key] = jax.jit(step_fn, in_shardings=(rep, bs),
                                 out_shardings=(rep, rep), donate_argnums=0)
        return cache[key](state, batch)

    return stepper


def make_scan_train_step(net, mesh=None) -> Callable:
    """Multi-step training in ONE dispatch: batches are stacked with a
    leading step axis and consumed by lax.scan on device.

    Exists because per-step host dispatch is expensive on remote/tunneled
    accelerators (measured ~0.3s/step overhead on this stack vs ~10ms of
    compute); 50-step scans amortize it away. Same arithmetic as
    make_train_step.
    """

    loss_fn = _make_loss_fn(net)

    def scan_fn(state: TrainState, stacked_batches) -> tuple:
        def body(state, batch):
            return _step_body(loss_fn, state, batch)

        return jax.lax.scan(body, state, stacked_batches)

    if mesh is None:
        return jax.jit(scan_fn, donate_argnums=0)
    rep = replicated(mesh)
    bs = batch_sharding(mesh)
    return jax.jit(scan_fn, in_shardings=(rep, bs),
                   out_shardings=(rep, rep), donate_argnums=0)
