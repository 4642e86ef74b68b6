"""Training entry point (the reference ships Trainer scaffolding but no
train script, SURVEY §2.1 — this completes it).

Run:
    python -m monoport_tpu.apps.train --dataset synthetic --epochs 2 \
        -- batch_size 4 optim adam learning_rate 1e-3
    python -m monoport_tpu.apps.train --dataset ppl_dynamic \
        -- dataset.root_render /data/pifu_orth
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax

from ..config import get_cfg_defaults
from ..models import MonoPortNet
from ..training import Trainer
from ..training.datasets import (PPLDynamicDataset, PPLStaticDataset,
                                 SyntheticBlobDataset, make_batches)


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="synthetic",
                        choices=["synthetic", "ppl_dynamic", "ppl_static"])
    parser.add_argument("--net", default="netG", choices=["netG", "netC"])
    parser.add_argument("--netg", default="monoport_tpu/data/netg_capsule.npz",
                        help="frozen geometry net weights (.npz) supplying "
                        "netC's feat_prior (MonoPortNet.py:187-208: the "
                        "color net conditions on netG's features). An "
                        "empty string or a missing file falls back to a "
                        "PRNGKey(0)-initialized netG (CI fixtures).")
    parser.add_argument("--epochs", type=int, default=0,
                        help="override cfg.num_epoch")
    parser.add_argument("--resume_from", default="",
                        help="checkpoint dir to resume from (the reference "
                        "trainer's load_ckpt/resume, common/trainer.py:"
                        "80-90; set `-- resume True` to also restore the "
                        "optimizer state and epoch counter)")
    parser.add_argument("--steps_per_epoch", type=int, default=0)
    parser.add_argument("--image_size", type=int, default=512)
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        argv, opts = argv[:split], argv[split + 1:]
    else:
        opts = []
    args = parser.parse_args(argv)
    cfg = get_cfg_defaults()
    cfg.merge_from_list(opts)
    cfg.freeze()
    return args, cfg


def build_dataset(args, cfg):
    if args.dataset == "synthetic":
        return SyntheticBlobDataset(
            size=args.image_size,
            num_sample_geo=cfg.dataset.num_sample_geo,
            length=max(8, cfg.batch_size * 4))
    if args.dataset == "ppl_dynamic":
        return PPLDynamicDataset(cfg.dataset, cfg.dataset.root_render)
    return PPLStaticDataset(cfg.dataset, cfg.dataset.root_render)


def build_loader(args, cfg):
    """Multiprocess loader for the file-backed datasets (cfg.num_threads
    mirrors the reference's worker count, common/config.py:20)."""
    from ..training.datasets import DataLoader

    if args.dataset == "synthetic":
        return None  # in-memory; make_batches is enough
    factory = PPLDynamicDataset if args.dataset == "ppl_dynamic" \
        else PPLStaticDataset
    return DataLoader(factory, (cfg.dataset, cfg.dataset.root_render),
                      batch_size=cfg.batch_size,
                      num_workers=cfg.num_threads)


def to_train_batch(batch: dict, net: str = "netG") -> dict:
    """netG: occupancy supervision (samples_geo). netC: surface-color
    supervision (samples_color, ppl.get_sampling_color) — the caller adds
    'feat_prior' from the frozen geometry net (make_prior_fn)."""
    if net == "netC":
        return {"images": batch["image"],
                "points": batch["samples_color"],
                "calibs": batch["calib"], "labels": batch["labels_color"]}
    labels = batch["labels_geo"]
    if labels.ndim == 2:
        labels = labels[..., None]
    return {"images": batch["image"], "points": batch["samples_geo"],
            "calibs": batch["calib"], "labels": labels}


def make_prior_fn(cfg, netg_path: str):
    """Jitted (images -> feat_prior): the frozen netG's last feature stage
    (apps/train_capsule_netC.feat_prior_fn, here through the file-backed
    path). Missing/empty path = random-init netG (fixture-scale CI)."""
    import os

    import jax.numpy as jnp

    netG = MonoPortNet(cfg.netG)
    if netg_path and os.path.exists(netg_path):
        from ..utils.params_io import load_params
        params_g = {"params": load_params(netg_path)[0]}
    else:
        size = cfg.dataset.input_size
        params_g = netG.init(
            jax.random.PRNGKey(0), np.zeros((1, size, size, 3), np.float32),
            np.zeros((1, 8, 3), np.float32),
            np.eye(4, dtype=np.float32)[None])

    @jax.jit
    def prior_fn(images):
        return netG.apply(params_g, jnp.asarray(images), method="filter")[-1][-1]

    return prior_fn


def main(argv=None):
    args, cfg = parse_args(argv)
    net = MonoPortNet(cfg.netG if args.net == "netG" else cfg.netC)
    dataset = build_dataset(args, cfg)
    trainer = Trainer(net, cfg)
    epochs = args.epochs or cfg.num_epoch

    loader = build_loader(args, cfg)
    prior_fn = (make_prior_fn(cfg, args.netg) if args.net == "netC"
                else None)

    def prep(b):
        batch = jax.tree.map(np.asarray, to_train_batch(b, args.net))
        if prior_fn is not None:
            batch["feat_prior"] = np.asarray(prior_fn(batch["images"]))
        return batch

    if args.resume_from:
        # state must exist before load_ckpt: init from one example batch
        source = (loader.epoch(0) if loader is not None
                  else make_batches(dataset, cfg.batch_size, seed=0))
        trainer.init_state(prep(next(iter(source))))
        trainer.load_ckpt(args.resume_from)
    last = float("nan")
    for epoch in range(trainer.epoch, epochs):
        source = (loader.epoch(epoch) if loader is not None
                  else make_batches(dataset, cfg.batch_size, seed=epoch))
        batches = (prep(b) for b in source)
        last = trainer.train_epoch(batches, epoch)
        trainer.logger.info("epoch %d done, mean loss %.5f", epoch, last)
        # store epoch+1: a resume from this checkpoint CONTINUES with the
        # next epoch rather than re-running the finished one
        trainer.update_ckpt(f"epoch_{epoch}", epoch + 1, trainer.iteration)
    return last


if __name__ == "__main__":
    main()
