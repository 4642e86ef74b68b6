"""Trainer — optimization loop scaffolding with checkpoint/resume.

Reference contract: monoport/lib/common/trainer.py:12-105 — builds the
optimizer by config name (Adadelta/SGD/Adam/RMSprop), a MultiStepLR
schedule, checkpoint dicts {opt, net, optimizer, scheduler, epoch,
iteration}, resume, colorlogger and a tensorboard writer; wraps the net in
nn.DataParallel.

TPU-native redesign: data parallelism is the (data, points) mesh of
parallel.mesh + a sharded jitted train step (parallel.train_step); the
checkpoint is an orbax-saved pytree {params, opt_state, step, epoch} plus
the frozen config — and legacy PyTorch checkpoints load through
monoport_tpu.convert.
"""

from __future__ import annotations

import os
from typing import Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import make_mesh
from ..parallel.train_step import (TrainState, create_train_state,
                                   make_optimizer, make_train_step)
from .logger import colorlogger


class Trainer:
    def __init__(self, net, cfg, use_mesh: bool = True,
                 steps_per_epoch: int = 1000):
        self.net = net
        self.cfg = cfg
        self.epoch = 0
        self.iteration = 0

        self.checkpoints_path = os.path.join(cfg.checkpoints_path, cfg.name)
        self.results_path = os.path.join(cfg.results_path, cfg.name)
        os.makedirs(self.checkpoints_path, exist_ok=True)
        os.makedirs(self.results_path, exist_ok=True)
        self.logger = colorlogger(self.results_path)

        try:
            from tensorboardX import SummaryWriter
            self.tb_writer = SummaryWriter(logdir=self.results_path)
        except ImportError:  # pragma: no cover
            self.tb_writer = None

        # MultiStepLR milestones are epochs in the reference
        # (common/trainer.py:55); convert to steps.
        milestones = [int(m) * steps_per_epoch for m in cfg.schedule]
        self.tx = make_optimizer(cfg.optim, cfg.learning_rate,
                                 cfg.weight_decay, cfg.momentum,
                                 tuple(milestones), cfg.gamma,
                                 grad_clip=cfg.get("grad_clip", 0.0))
        n_dev = len(jax.devices())
        self.mesh = None
        if use_mesh and n_dev > 1:
            # dp must divide the batch; sp must divide the point count —
            # pick the largest dp that divides both batch_size and n_dev,
            # and only keep a points axis if it can be even
            dp = 1
            while (dp * 2 <= n_dev and cfg.batch_size % (dp * 2) == 0
                   and n_dev % (dp * 2) == 0):
                dp *= 2
            sp = n_dev // dp
            if cfg.dataset.num_sample_geo % sp == 0:
                self.mesh = make_mesh(dp=dp)
            elif dp > 1:
                self.mesh = make_mesh(n_devices=dp, dp=dp)
        self.step_fn = make_train_step(net, mesh=self.mesh)
        self.state: Optional[TrainState] = None

    # -- state --------------------------------------------------------------
    def init_state(self, example_batch, rng=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        self.state = create_train_state(self.net, rng, example_batch,
                                        self.tx)
        return self.state

    def load_params(self, variables: dict) -> None:
        """Adopt externally converted params (e.g. legacy PyTorch ckpts)."""
        assert self.state is not None, "call init_state first"
        self.state = self.state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats",
                                      self.state.batch_stats))

    # -- checkpointing (reference update_ckpt/load_ckpt, trainer.py:61-90) --
    def update_ckpt(self, filename: str, epoch: int, iteration: int,
                    **kwargs) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(self.checkpoints_path, filename))
        ckpt = {
            "params": self.state.params,
            "opt_state": self.state.opt_state,
            "step": np.asarray(self.state.step),
            "epoch": np.asarray(epoch),
            "iteration": np.asarray(iteration),
            "opt": self.cfg.to_dict(),
            **kwargs,
        }
        if self.state.batch_stats is not None:  # norm='batch_train' nets
            ckpt["batch_stats"] = self.state.batch_stats
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, ckpt, force=True)
        self.logger.info("saving ckpt to %s", path)

    def load_ckpt(self, path: str) -> None:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        self.logger.info("loading ckpt from %s", path)
        with ocp.PyTreeCheckpointer() as ckptr:
            ckpt = ckptr.restore(path)
        self.state = self.state.replace(params=ckpt["params"])
        if "batch_stats" in ckpt:
            self.state = self.state.replace(batch_stats=ckpt["batch_stats"])
        if self.cfg.resume:
            self.logger.info("resume training with optimizer state")
            # orbax restores plain dict/list containers; graft the leaves
            # back into the live opt_state structure (NamedTuples)
            structure = jax.tree.structure(self.state.opt_state)
            leaves = jax.tree.leaves(ckpt["opt_state"])
            self.state = self.state.replace(
                opt_state=jax.tree.unflatten(structure, [
                    jnp.asarray(a) for a in leaves]),
                step=jnp.asarray(ckpt["step"]))
            self.epoch = int(ckpt["epoch"])
            self.iteration = int(ckpt["iteration"])

    # -- evaluation (cfg.freq_eval hook; metrics in training/metrics.py) ----
    def evaluate(self, eval_batch: dict) -> dict:
        from .metrics import evaluate_occupancy

        from ..models.monoport_net import eval_net

        variables = {"params": self.state.params}
        net = self.net
        if self.state.batch_stats is not None:
            variables["batch_stats"] = self.state.batch_stats
            net = eval_net(net)  # running-stat BN for evaluation
        metrics = evaluate_occupancy(net, variables, eval_batch)
        self.logger.info("eval iter %d: %s", self.iteration, metrics)
        if self.tb_writer is not None:
            for k, v in metrics.items():
                self.tb_writer.add_scalar(f"eval/{k}", v, self.iteration)
        return metrics

    # -- loop ---------------------------------------------------------------
    def train_epoch(self, batches: Iterable[dict], epoch: int,
                    eval_batch: Optional[dict] = None) -> float:
        losses = []
        for batch in batches:
            if self.state is None:
                self.init_state(batch)
            self.state, loss = self.step_fn(self.state, batch)
            self.iteration += 1
            if self.iteration % self.cfg.freq_plot == 0:
                lossf = float(loss)
                losses.append(lossf)
                self.logger.info("epoch %d iter %d loss %.5f",
                                 epoch, self.iteration, lossf)
                if self.tb_writer is not None:
                    self.tb_writer.add_scalar("train/loss", lossf,
                                              self.iteration)
            if self.iteration % self.cfg.freq_save == 0:
                self.update_ckpt(f"ckpt_{self.iteration}", epoch,
                                 self.iteration)
            if (eval_batch is not None
                    and self.iteration % self.cfg.freq_eval == 0):
                self.evaluate(eval_batch)
        self.epoch = epoch
        return float(np.mean(losses)) if losses else float("nan")
