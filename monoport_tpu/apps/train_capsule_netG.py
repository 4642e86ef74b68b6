"""Train the flagship netG on the on-device capsule-human dataset and
save committed-size weights (f16 npz).

Purpose: a REAL trained occupancy model for the end-to-end bench and demo
(the reference's PIFu checkpoints are behind a Google Drive download,
scripts/download_model.sh — unreachable with zero egress). The capsule
dataset renders images and 3D labels from the same analytic body, so the
model genuinely learns pixel-aligned image->occupancy inference.

Run (real TPU; steps fully on-device via lax.scan):
    python -m monoport_tpu.apps.train_capsule_netG --steps 1500 \
        --out monoport_tpu/data/netg_capsule.npz
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import get_cfg_defaults
from ..models import MonoPortNet
from ..training.datasets.capsule import (capsule_occupancy, skeleton3d,
                                         synth_train_batch)
from ..utils.params_io import save_params


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=1500)
    parser.add_argument("--chunk", type=int, default=50)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--points", type=int, default=4096)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--hard", type=int, default=1,
                        help="r3 curriculum: wider scales, harder poses, "
                        "clothing displacement, textured appearance "
                        "(VERDICT r2 item 2); the plain look stays in "
                        "distribution")
    parser.add_argument("--sigma", type=float, default=None,
                        help="surface-sample sigma override (default: the "
                        "per-mode value, 0.035 hard / 0.05 plain — the "
                        "r3-decisive quality lever, DESIGN.md)")
    parser.add_argument("--family", default="capsule",
                        choices=["capsule", "mixed"],
                        help="mixed: half hard-capsule, half superquadric "
                        "bodies with a flat-render slice (r4 cross-family "
                        "curriculum, datasets/superquadric.py)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--init_from", default=None,
                        help="npz checkpoint to continue training from")
    parser.add_argument("--out", default="monoport_tpu/data/netg_capsule.npz")
    args = parser.parse_args(argv)
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()  # remote-compile relay: reuse compiled programs
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = get_cfg_defaults()
    net = MonoPortNet(cfg.netG)
    tx = optax.adam(optax.cosine_decay_schedule(
        args.lr, args.steps, alpha=0.05))

    if args.family == "mixed":
        from ..training.datasets.superquadric import mixed_train_batch
        batch_fn = functools.partial(mixed_train_batch, batch=args.batch,
                                     size=args.size, n_points=args.points,
                                     sigma=args.sigma)
    else:
        batch_fn = functools.partial(synth_train_batch, batch=args.batch,
                                     size=args.size, n_points=args.points,
                                     hard=bool(args.hard), sigma=args.sigma)

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    # jit both: eager op-by-op init costs ~0.5s/dispatch on the tunneled
    # backend (thousands of ops for the 4-stack hourglass — see DESIGN.md)
    ex = jax.jit(batch_fn)(jax.random.PRNGKey(1))
    variables = jax.jit(functools.partial(net.init, train=True))(
        k_init, ex["images"], ex["points"], ex["calibs"],
        labels=ex["labels"])
    params = variables["params"]
    if args.init_from:
        from ..utils.params_io import load_params
        loaded = load_params(args.init_from)[0]
        # structural check: continuing training requires the same arch
        jax.tree.map(lambda a, b: None, params, loaded)
        params = loaded
        print(f"continuing from {args.init_from}", flush=True)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    print(f"netG params: {n_params/1e6:.2f}M", flush=True)
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        _, loss = net.apply({"params": params}, batch["images"],
                            batch["points"], batch["calibs"],
                            labels=batch["labels"], train=True)
        return loss

    def step(carry, k):
        params, opt_state = carry
        batch = batch_fn(k)
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), opt_state), loss

    @functools.partial(jax.jit, static_argnums=2, donate_argnums=0)
    def run(state, key, n):
        return jax.lax.scan(step, state, jax.random.split(key, n))

    state = (params, opt_state)
    t0 = time.time()
    done = 0
    while done < args.steps:
        n = min(args.chunk, args.steps - done)
        key, k_run = jax.random.split(key)
        state, losses = run(state, k_run, n)
        done += n
        print(f"step {done}/{args.steps} mean loss "
              f"{float(np.asarray(losses.mean())):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    params = state[0]
    # held-out point-classification IOU on fresh bodies (jitted end to
    # end: eager dispatches are ~0.5s each through the tunnel)
    from ..training.datasets.capsule import render_front, sample_points

    @jax.jit
    def heldout(params):
        caps = skeleton3d(jax.random.PRNGKey(args.seed + 31337))
        image, _ = render_front(caps, args.size)
        pts, labels = sample_points(jax.random.PRNGKey(2), caps, 8192)
        pred = net.apply({"params": params}, image[None], pts[None],
                         jnp.eye(4)[None])
        return pred, labels

    pred, labels = heldout(params)
    p = np.asarray(pred[0, :, 0]) > 0.5
    g = np.asarray(labels[:, 0]) > 0.5
    iou = (p & g).sum() / max((p | g).sum(), 1)
    print(f"held-out point IOU: {iou:.4f}", flush=True)

    save_params(args.out, params)
    print(f"saved {args.out}", flush=True)
    return iou


if __name__ == "__main__":
    main()
