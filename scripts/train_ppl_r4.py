"""Round-4 PPL convergence run (VERDICT r3 item 5).

Trains the FULL netG through the real file-backed path — rich multi-
subject/multi-rotation/textured PPLDynamicDataset fixture tree ->
DataLoader -> Trainer -> jitted train step (apps/train.py) — long enough
to show (a) decreasing epoch losses, (b) held-out-subject eval-IOU
improvement over init, (c) a mid-run checkpoint RESUME that continues
the trajectory. Reference contract: the PPL dataset + Trainer are the
reference's whole training story (ppl_dynamic.py:262-298,
common/trainer.py:61-90).

Run (TPU; ~15 min first time through the compile relay):
    python scripts/train_ppl_r4.py [--epochs_a 4] [--epochs_total 10]
Prints one JSON line with the loss ladder and the IOU table; paste the
numbers into DESIGN.md.
"""

import argparse
import json
import os
import re
import shutil
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from monoport_tpu.utils.compile_cache import enable as _enable  # noqa: E402

_enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

CFG_OVERRIDES = [
    "dataset.rotation_step", "60",
    "dataset.num_sample_geo", "512",
    "dataset.blur", "0.0",
    "batch_size", "4",
    "num_threads", "2",
    "freq_plot", "1",
    "freq_save", "100000",
    "optim", "adam",
    "learning_rate", "3e-4",
    "schedule", "[1000]",
]


def build_trees(base: str):
    from monoport_tpu.training.datasets.fixture import make_dynamic_fixture
    train_root = os.path.join(base, "train")
    val_root = os.path.join(base, "val")
    make_dynamic_fixture(train_root,
                         subjects=tuple(f"s{i}" for i in range(6)),
                         rotations=tuple(range(0, 360, 60)), rich=True,
                         textured=True, broken=False, seed=100)
    info = make_dynamic_fixture(val_root, subjects=("val_a",),
                                rotations=tuple(range(0, 360, 60)),
                                rich=True, textured=True, broken=False,
                                seed=777)
    return train_root, val_root, info


def make_eval(val_root: str):
    """Jitted held-out eval: point-classification IOU over the val
    subject's (image, calib, samples) items at every rotation."""
    import random

    from monoport_tpu.config import get_cfg_defaults
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.training.datasets.ppl import PPLDynamicDataset

    cfg = get_cfg_defaults()
    cfg.merge_from_list(CFG_OVERRIDES)
    ds = PPLDynamicDataset(cfg.dataset, val_root, training=False)
    random.seed(0)
    np.random.seed(0)
    items = [ds.get_item(i) for i in range(len(ds))]
    images = jnp.asarray(np.stack([it["image"] for it in items]))
    calibs = jnp.asarray(np.stack([it["calib"] for it in items]))
    pts = jnp.asarray(np.stack([it["samples_geo"] for it in items]))
    labels = np.stack([it["labels_geo"] for it in items]) > 0.5
    net = MonoPortNet(cfg.netG)

    @jax.jit
    def fwd(params):
        return net.apply({"params": params}, images, pts, calibs)

    def eval_iou(params):
        pred = np.asarray(fwd(params))[..., 0] > 0.5
        return float((pred & labels).sum() / max((pred | labels).sum(), 1))

    return eval_iou


def init_params(train_root: str):
    """The same init Trainer.init_state produces (PRNGKey(0))."""
    from monoport_tpu.apps.train import build_loader, parse_args, \
        to_train_batch
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.parallel.train_step import create_train_state, \
        make_optimizer

    args, cfg = parse_args(["--dataset", "ppl_dynamic", "--",
                            "dataset.root_render", train_root]
                           + CFG_OVERRIDES)
    loader = build_loader(args, cfg)
    batch = jax.tree.map(np.asarray,
                         to_train_batch(next(iter(loader.epoch(0)))))
    net = MonoPortNet(cfg.netG)
    state = create_train_state(net, jax.random.PRNGKey(0), batch,
                               make_optimizer("adam", 3e-4))
    return state.params


def load_ckpt_params(path: str):
    import orbax.checkpoint as ocp
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path))["params"]


def epoch_losses(results_dir: str):
    out = {}
    with open(os.path.join(results_dir, "train_logs.txt")) as f:
        for line in f:
            m = re.search(r"epoch (\d+) done, mean loss ([0-9.]+)", line)
            if m:
                out[int(m.group(1))] = float(m.group(2))
    return [out[k] for k in sorted(out)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs_a", type=int, default=4)
    ap.add_argument("--epochs_total", type=int, default=10)
    ap.add_argument("--keep", default="")
    args = ap.parse_args()

    from monoport_tpu.apps.train import main as train_main

    base = args.keep or tempfile.mkdtemp(prefix="ppl_r4_")
    train_root, val_root, _ = build_trees(base)
    ckpt_dir = os.path.join(base, "ckpt")
    res_dir = os.path.join(base, "results")
    out = {"base": base}

    eval_iou = make_eval(val_root)
    out["iou_init"] = round(eval_iou(init_params(train_root)), 4)
    print(json.dumps(out), flush=True)

    common = ["--dataset", "ppl_dynamic", "--",
              "dataset.root_render", train_root,
              "checkpoints_path", ckpt_dir,
              "results_path", res_dir,
              "name", "ppl_r4"] + CFG_OVERRIDES
    train_main(["--epochs", str(args.epochs_a)] + common)
    ck_a = os.path.join(ckpt_dir, "ppl_r4", f"epoch_{args.epochs_a - 1}")
    out["iou_after_a"] = round(eval_iou(load_ckpt_params(ck_a)), 4)
    print(json.dumps(out), flush=True)

    # mid-run RESUME: continue from the phase-A checkpoint (optimizer
    # state + epoch counter restored via cfg.resume)
    train_main(["--epochs", str(args.epochs_total),
                "--resume_from", ck_a] + common + ["resume", "True"])
    ck_b = os.path.join(ckpt_dir, "ppl_r4",
                        f"epoch_{args.epochs_total - 1}")
    out["iou_after_b"] = round(eval_iou(load_ckpt_params(ck_b)), 4)
    out["epoch_losses"] = [round(x, 4) for x in epoch_losses(
        os.path.join(res_dir, "ppl_r4"))]
    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)
        out["base"] = "(removed)"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
