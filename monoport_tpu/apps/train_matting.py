"""Train MatteNet on procedural human composites and save a checkpoint.

Completes the reference's segmentation story for a zero-egress environment
(the reference downloads pretrained torchhub models, README.md:59-60; here
the weights are produced in-repo). The committed default checkpoint at
``monoport_tpu/data/mattenet.npz`` is loaded automatically by
``Segmentation.load_default()`` in every demo app.

Run (real TPU, steps fully on-device):
    python -m monoport_tpu.apps.train_matting --steps 3000 --out \
        monoport_tpu/data/mattenet.npz
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from ..pipeline.segmentation import MatteNet
from ..training.matting import (alpha_iou, make_train_fns, save_params,
                                synth_batch)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--chunk", type=int, default=100,
                        help="steps per device dispatch")
    parser.add_argument("--size", type=int, default=256)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--width", type=int, default=16)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true",
                        help="pin the CPU backend (tests / no-TPU boxes)")
    parser.add_argument("--out", default="monoport_tpu/data/mattenet.npz")
    args = parser.parse_args(argv)

    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()  # remote-compile relay: reuse compiled programs
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    net = MatteNet(width=args.width)
    init_fn, run_fn = make_train_fns(net, args.size, args.batch, args.lr)
    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    state = init_fn(k_init)
    run = jax.jit(run_fn, static_argnums=2)

    t0 = time.time()
    done = 0
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        key, k_run = jax.random.split(key)
        state, loss = run(state, k_run, n)
        loss = float(np.asarray(loss))  # materializes the chunk
        done += n
        print(f"step {done}/{args.steps} mean loss {loss:.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    params = state[0]
    # held-out eval on fresh composites
    key_eval = jax.random.PRNGKey(args.seed + 10_000)
    images, alpha_gt = synth_batch(key_eval, 8, args.size)
    logits = jax.jit(net.apply)(params, images * 2.0 - 1.0)[..., 0]
    iou = float(np.asarray(alpha_iou(jax.nn.sigmoid(logits), alpha_gt)))
    print(f"held-out alpha IOU @{args.size}: {iou:.4f}", flush=True)

    save_params(args.out, params, args.width)
    print(f"saved {args.out}", flush=True)
    return iou


if __name__ == "__main__":
    main()
