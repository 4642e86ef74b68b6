"""Held-out silhouette-IOU eval for a candidate netG checkpoint.

Measures model-vs-GT silhouette IOU at the bench profile (257^2 ray grid,
march pyramid, the same metric as bench.py's `real_model_vs_gt_iou`) on
held-out bodies, so training probes compare apples-to-apples against the
committed weights (r3: 0.9004 on PRNGKey(31337)).

Run (real TPU; programs hit the warm compile cache):
    python scripts/eval_netg.py [ckpt.npz ...]   # default: committed
"""

import os
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from monoport_tpu import get_cfg_defaults  # noqa: E402
from monoport_tpu.engine import EngineCfg, ReconEngine  # noqa: E402
from monoport_tpu.models import MonoPortNet  # noqa: E402
from monoport_tpu.recon.hierarchy import HierarchicalRecon  # noqa: E402
from monoport_tpu.training.datasets.capsule import (  # noqa: E402
    capsule_occupancy, render_front, skeleton3d)
from monoport_tpu.utils.compile_cache import enable as _enable  # noqa: E402
from monoport_tpu.utils.params_io import load_params  # noqa: E402

_enable()

HELD_OUT_SEEDS = (31337, 4242, 777)   # bench body, test body, extra


def gt_silhouette(caps, res: int = 257, n_z: int = 64):
    ax = jnp.linspace(-1, 1, res)
    gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
    sil = None
    for z in jnp.linspace(-1, 1, n_z):
        occ = np.asarray(capsule_occupancy(
            jnp.stack([gx, gy, jnp.full_like(gx, z)], -1), caps)) > 0.5
        sil = occ if sil is None else (sil | occ)
    return sil


def eval_ckpt(path: str):
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    params_g = {"params": load_params(path)[0]}
    engine = ReconEngine(netG,
                 recon=HierarchicalRecon(resolutions=(17, 33, 65), budgets=(0, 4096, 16384), select="uncertain"),
                 config=EngineCfg.flat(mode="ray", fine_res=257, ray_taps=6,
                                       ray_window=192,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=True, march_levels=(33, 65)))
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    ious = {}
    for seed in HELD_OUT_SEEDS:
        caps = skeleton3d(jax.random.PRNGKey(seed))
        image = render_front(caps, 512)[0][None]
        out = engine.frame(params_g, image, calib=calib)
        got = np.asarray(out["valid"]) > 0.5
        gt = gt_silhouette(caps)
        ious[seed] = float((got & gt).sum() / max((got | gt).sum(), 1))
    return ious


def main():
    paths = sys.argv[1:] or [os.path.join(
        os.path.dirname(__file__), os.pardir, "monoport_tpu", "data",
        "netg_capsule.npz")]
    for p in paths:
        ious = eval_ckpt(p)
        mean = sum(ious.values()) / len(ious)
        print(f"{p}: " + " ".join(f"seed{k}={v:.4f}"
                                  for k, v in ious.items())
              + f" mean={mean:.4f}", flush=True)


if __name__ == "__main__":
    main()
