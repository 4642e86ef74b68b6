"""Round-5 PPL convergence run (VERDICT r4 item 5): BOTH nets through the
real file-backed path.

Phase G extends round 4's netG run (more subjects + rotations + epochs,
scripts/train_ppl_r4.py measured held-out IOU 0.0 -> 0.565 @30) toward
held-out-subject IOU >= 0.70; phase C then trains the COLOR net through
the same PPLDynamicDataset contract — fixture color_{i}.npy files ->
get_sampling_color -> DataLoader -> Trainer -> jitted step with the
phase-G netG frozen as feat_prior (apps/train.py --net netC) — with a
mid-run checkpoint RESUME, and reports held-out color PSNR before/after.
Reference contract: MonoPortNet.py:163-208 trains netG and netC from the
same dataset family; ppl_dynamic.py:262-298 is the sampling contract
(its color path raises NotImplementedError at :144 — ours implements it).

Run (TPU; compile relay makes the first epochs slow):
    python scripts/train_ppl_r5.py [--epochs_g 40] [--epochs_c 12]
Prints incremental JSON lines; paste the final ladder into DESIGN.md.
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

CFG_G = [
    "dataset.rotation_step", "45",
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
CFG_C = CFG_G + [
    "dataset.num_sample_color", "512",
    "dataset.sigma_color", "0.002",
    # netC: un-normalized ResnetFilter output explodes under plain adam
    # at lr >= 1e-3 (train_capsule_netC.py measured it); clip like it does.
    # With the clip + PIFuNetCMLP's out_init_scale (the r5 fix for the
    # measured init-saturation plateau: loss pinned at 0.82, PSNR 6.4->5.4
    # over 12 epochs) lr 1e-3 is stable and converges in the few-hundred-
    # step budget this run has (the capsule run had 3000 steps at 3e-4).
    "learning_rate", "1e-3",
    "grad_clip", "1.0",
    # in-process loading: the loader forks a fresh pool per epoch, and by
    # phase C the process carries enough live JAX/relay threads that a
    # fork can land mid-lock and deadlock the worker (measured: r5 run
    # hung at phase-C epoch 2, worker in futex_do_wait forever). Phase G
    # keeps num_threads=2 and exercises the multiprocess path on TPU.
    "num_threads", "0",
]


def build_trees(base: str, n_subjects: int):
    from monoport_tpu.training.datasets.fixture import make_dynamic_fixture
    train_root = os.path.join(base, "train")
    val_root = os.path.join(base, "val")
    make_dynamic_fixture(train_root,
                         subjects=tuple(f"s{i}" for i in range(n_subjects)),
                         rotations=tuple(range(0, 360, 45)), rich=True,
                         textured=True, broken=False, seed=100)
    make_dynamic_fixture(val_root, subjects=("val_a",),
                         rotations=tuple(range(0, 360, 45)), rich=True,
                         textured=True, broken=False, seed=777)
    return train_root, val_root


def val_items(val_root: str, with_color: bool = False):
    import random

    from monoport_tpu.config import get_cfg_defaults
    from monoport_tpu.training.datasets.ppl import PPLDynamicDataset

    cfg = get_cfg_defaults()
    cfg.merge_from_list(CFG_C if with_color else CFG_G)
    ds = PPLDynamicDataset(cfg.dataset, val_root, training=False)
    random.seed(0)
    np.random.seed(0)
    return [ds.get_item(i) for i in range(len(ds))]


def make_eval_g(val_root: str):
    from monoport_tpu.config import get_cfg_defaults
    from monoport_tpu.models import MonoPortNet

    items = val_items(val_root)
    images = jnp.asarray(np.stack([it["image"] for it in items]))
    calibs = jnp.asarray(np.stack([it["calib"] for it in items]))
    pts = jnp.asarray(np.stack([it["samples_geo"] for it in items]))
    labels = np.stack([it["labels_geo"] for it in items]) > 0.5
    cfg = get_cfg_defaults()
    net = MonoPortNet(cfg.netG)

    @jax.jit
    def fwd(params):
        return net.apply({"params": params}, images, pts, calibs)

    def eval_iou(params):
        pred = np.asarray(fwd(params))[..., 0] > 0.5
        return float((pred & labels).sum() / max((pred | labels).sum(), 1))

    return eval_iou


def make_eval_c(val_root: str, netg_npz: str):
    """Held-out color PSNR: netC point predictions vs the albedo labels
    on the [0, 1] scale (PSNR = -10 log10 MSE), feat_prior from the
    frozen phase-G netG."""
    from monoport_tpu.config import get_cfg_defaults
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.utils.params_io import load_params

    items = val_items(val_root, with_color=True)
    images = jnp.asarray(np.stack([it["image"] for it in items]))
    calibs = jnp.asarray(np.stack([it["calib"] for it in items]))
    pts = jnp.asarray(np.stack([it["samples_color"] for it in items]))
    labels = np.stack([it["labels_color"] for it in items])  # [-1, 1]
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)
    params_g = {"params": load_params(netg_npz)[0]}

    @jax.jit
    def fwd(params):
        prior = netG.apply(params_g, images, method="filter")[-1][-1]
        return netC.apply({"params": params}, images, pts, calibs,
                          feat_prior=prior)

    def eval_psnr(params):
        pred01 = (np.asarray(fwd(params)) + 1.0) / 2.0
        mse = float(np.mean((pred01 - (labels + 1.0) / 2.0) ** 2))
        return -10.0 * np.log10(max(mse, 1e-12))

    return eval_psnr


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
    return [round(out[k], 4) for k in sorted(out)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs_g", type=int, default=40)
    ap.add_argument("--epochs_c", type=int, default=12)
    ap.add_argument("--epochs_c_resume_at", type=int, default=6)
    ap.add_argument("--subjects", type=int, default=8)
    ap.add_argument("--skip_g", default="",
                    help="reuse a previous run's netG npz (skip phase G)")
    ap.add_argument("--keep", default="")
    args = ap.parse_args()

    from monoport_tpu.apps.train import main as train_main
    from monoport_tpu.utils.params_io import save_params

    base = args.keep or tempfile.mkdtemp(prefix="ppl_r5_")
    train_root, val_root = build_trees(base, args.subjects)
    out = {"base": base}

    # ---- phase G: netG, deeper than r4 ------------------------------------
    netg_npz = args.skip_g or os.path.join(base, "netg_ppl_r5.npz")
    eval_iou = make_eval_g(val_root)
    if not args.skip_g:
        common_g = ["--dataset", "ppl_dynamic", "--",
                    "dataset.root_render", train_root,
                    "checkpoints_path", os.path.join(base, "ckpt"),
                    "results_path", os.path.join(base, "results"),
                    "name", "netg_r5"] + CFG_G
        train_main(["--epochs", str(args.epochs_g)] + common_g)
        ck = os.path.join(base, "ckpt", "netg_r5",
                          f"epoch_{args.epochs_g - 1}")
        params_g = load_ckpt_params(ck)
        save_params(netg_npz, params_g)
        out["netg_epoch_losses"] = epoch_losses(
            os.path.join(base, "results", "netg_r5"))
    else:
        from monoport_tpu.utils.params_io import load_params
        params_g = load_params(netg_npz)[0]
    out["netg_iou_heldout"] = round(eval_iou(params_g), 4)
    print(json.dumps(out), flush=True)

    # ---- phase C: netC through the same path, with a mid-run resume -------
    eval_psnr = make_eval_c(val_root, netg_npz)
    common_c = ["--dataset", "ppl_dynamic", "--net", "netC",
                "--netg", netg_npz, "--",
                "dataset.root_render", train_root,
                "checkpoints_path", os.path.join(base, "ckpt"),
                "results_path", os.path.join(base, "results"),
                "name", "netc_r5"] + CFG_C

    train_main(["--epochs", str(args.epochs_c_resume_at)] + common_c)
    ck_a = os.path.join(base, "ckpt", "netc_r5",
                        f"epoch_{args.epochs_c_resume_at - 1}")
    out["netc_psnr_init"] = None  # filled below from a fresh init
    out["netc_psnr_mid"] = round(eval_psnr(load_ckpt_params(ck_a)), 2)
    print(json.dumps(out), flush=True)

    train_main(["--epochs", str(args.epochs_c),
                "--resume_from", ck_a] + common_c + ["resume", "True"])
    ck_b = os.path.join(base, "ckpt", "netc_r5",
                        f"epoch_{args.epochs_c - 1}")
    out["netc_psnr_final"] = round(eval_psnr(load_ckpt_params(ck_b)), 2)
    out["netc_epoch_losses"] = epoch_losses(
        os.path.join(base, "results", "netc_r5"))

    # init-params baseline for the PSNR delta (same init the Trainer uses)
    from monoport_tpu.apps.train import (build_loader, make_prior_fn,
                                         parse_args, to_train_batch)
    from monoport_tpu.config import get_cfg_defaults  # noqa: F401
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.parallel.train_step import (create_train_state,
                                                  make_optimizer)
    targs, tcfg = parse_args(["--dataset", "ppl_dynamic", "--net", "netC",
                              "--netg", netg_npz, "--",
                              "dataset.root_render", train_root] + CFG_C)
    loader = build_loader(targs, tcfg)
    prior_fn = make_prior_fn(tcfg, netg_npz)
    batch = jax.tree.map(np.asarray,
                         to_train_batch(next(iter(loader.epoch(0))), "netC"))
    batch["feat_prior"] = np.asarray(prior_fn(batch["images"]))
    init = create_train_state(MonoPortNet(tcfg.netC), jax.random.PRNGKey(0),
                              batch, make_optimizer("adam", 3e-4)).params
    out["netc_psnr_init"] = round(eval_psnr(init), 2)

    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)
        out["base"] = "(removed)"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
