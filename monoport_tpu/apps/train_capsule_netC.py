"""Train the color network (netC) on capsule humans, with the committed
capsule netG frozen as the geometry-feature prior.

Completes the trained in-repo weight set (netG: train_capsule_netG.py;
matting: train_matting.py): surface points get ground-truth colors from
the same shading model the render painted into the image, so netC has to
perform real pixel-aligned color inference. Base colors are jittered per
body so color comes from the image, not from memorization.

Run (real TPU):
    python -m monoport_tpu.apps.train_capsule_netC --steps 3000 \
        --out monoport_tpu/data/netc_capsule.npz
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
from ..training.datasets.capsule import (render_front,
                                         sample_surface_points,
                                         skeleton3d, surface_color)
from ..utils.params_io import load_params, save_params


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=3000)
    parser.add_argument("--chunk", type=int, default=150)
    parser.add_argument("--size", type=int, default=512)
    parser.add_argument("--batch", type=int, default=2)
    parser.add_argument("--points", type=int, default=4096)
    parser.add_argument("--lr", type=float, default=3e-4)
    parser.add_argument("--hard", type=int, default=1,
                        help="match netG's r3 curriculum: clothed bodies "
                        "+ textured appearance (netC must read color "
                        "from the image, not memorize the shading)")
    parser.add_argument("--mixed", type=int, default=0,
                        help="cross-family curriculum: 50/50 capsule/"
                        "superquadric bodies with a --flat_prob shading-"
                        "free slice whose color labels drop the depth cue "
                        "too. Fixes the r5-measured crater: the capsule-"
                        "only netC predicts SHADED colors on flat renders "
                        "(eval_crossfam sq_flat tex 18.4 dB vs shaded "
                        "28.5) because shading was a constant of its "
                        "training distribution, not an image cue")
    parser.add_argument("--flat_prob", type=float, default=0.3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--cpu", action="store_true")
    parser.add_argument("--netg", default="monoport_tpu/data/netg_capsule.npz")
    parser.add_argument("--out", default="monoport_tpu/data/netc_capsule.npz")
    args = parser.parse_args(argv)
    from ..utils.compile_cache import enable as _enable_cache
    _enable_cache()  # remote-compile relay: reuse compiled programs
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)
    params_g = {"params": load_params(args.netg)[0]}
    # clip is load-bearing: the un-normalized ResnetFilter output
    # (reference parity: last block skips its final norm and use_tanh is
    # False, ResBlkFilters.py:74-77,146) explodes under plain adam at any
    # lr >= 1e-3 and saturates the tanh head to exactly-zero gradients
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adam(optax.cosine_decay_schedule(
            args.lr, args.steps, alpha=0.05)))

    def _plain_anchor(key, app):
        # 50/50 plain anchor: half the stream is the bench/demo look
        # (default base with brightness jitter, no texture pattern,
        # bare body). Without it the texture curriculum makes netC
        # hallucinate faint patterns on plain bodies: measured 20.0 dB
        # vs 27.9 dB on the plain held-out capsule (r3 ledger).
        from ..training.datasets.capsule import _DEFAULT_BASE
        k_mix, k_pb = jax.random.split(jax.random.fold_in(key, 99))
        plain = jax.random.bernoulli(k_mix, 0.5)
        keep = 1.0 - plain.astype(jnp.float32)
        base_plain = jnp.asarray(_DEFAULT_BASE) * jax.random.uniform(
            k_pb, (3,), minval=0.8, maxval=1.15)
        return {"base": jnp.where(plain, base_plain, app["base"]),
                "amp": app["amp"] * keep,
                "freq": app["freq"], "phase": app["phase"]}, keep

    def _flat(key):
        # shading-free slice (traced bool): the render drops the depth
        # cue AND the color labels drop it with it (surface_color flat=)
        if not args.mixed:
            return False
        return (jax.random.uniform(jax.random.fold_in(key, 55), ())
                < args.flat_prob)

    def make_sq_item(key):
        """Superquadric half of the --mixed curriculum (same appearance/
        shading model: superquadric.render_front rides render_front_occ,
        so capsule.surface_color is its exact color ground truth too)."""
        from ..training.datasets import superquadric as sq
        from ..training.datasets.capsule import sample_appearance
        k_body, k_app, k_pts = jax.random.split(key, 3)
        body = sq.sq_body(k_body)
        app, _ = _plain_anchor(key, sample_appearance(k_app))
        flat = _flat(key)
        image, _ = sq.render_front(body, args.size, appearance=app,
                                   flat=flat)
        pts = sq.sample_surface_points(k_pts, body, args.points)
        colors = surface_color(pts, appearance=app, flat=flat)
        return image, pts, colors

    def make_item(key):
        k_skel, k_base, k_pts, k_cloth = jax.random.split(key, 4)
        if args.hard:
            from ..training.datasets.capsule import clothe, sample_appearance
            caps = clothe(k_cloth, skeleton3d(
                k_skel, scale_range=(0.45, 1.0), pose_spread=1.35,
                z_spread=0.35), amp=(0.0, 0.30))
            app, keep = _plain_anchor(key, sample_appearance(k_base))
            amp_v, freq, phase = caps[3]
            caps = (caps[0], caps[1], caps[2], (amp_v * keep, freq, phase))
            flat = _flat(key)
            image, _ = render_front(caps, args.size, appearance=app,
                                    flat=flat)
            pts = sample_surface_points(k_pts, caps, args.points)
            colors = surface_color(pts, appearance=app, flat=flat)
        else:
            caps = skeleton3d(k_skel)
            base = jnp.asarray([0.8, 0.65, 0.55]) * jax.random.uniform(
                k_base, (3,), minval=0.7, maxval=1.2)
            image, _ = render_front(caps, args.size, base_color=base)
            pts = sample_surface_points(k_pts, caps, args.points)
            colors = surface_color(pts, base_color=base)
        return image, pts, colors

    def make_batch(key):
        if args.mixed:
            assert args.batch >= 2, "--mixed needs batch >= 2"
            # static half/half family split (mixed_train_batch scheme):
            # one jitted step trains on both families, no item branching
            k_caps, k_sq = jax.random.split(key)
            n_caps = max(1, args.batch // 2)
            ic, pc, cc = jax.vmap(make_item)(
                jax.random.split(k_caps, n_caps))
            isq, psq, csq = jax.vmap(make_sq_item)(
                jax.random.split(k_sq, args.batch - n_caps))
            image = jnp.concatenate([ic, isq], axis=0)
            pts = jnp.concatenate([pc, psq], axis=0)
            colors = jnp.concatenate([cc, csq], axis=0)
        else:
            image, pts, colors = jax.vmap(make_item)(
                jax.random.split(key, args.batch))
        calib = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None],
                         (args.batch, 1, 1))
        return image, pts, colors, calib

    def feat_prior_fn(image):
        feats_g = netG.apply(params_g, image, method="filter")
        return feats_g[-1][-1]                      # [B, 128, 128, 256]

    key = jax.random.PRNGKey(args.seed)
    key, k_init = jax.random.split(key)
    image, pts, colors, calib = jax.jit(make_batch)(jax.random.PRNGKey(1))
    variables = jax.jit(functools.partial(netC.init, train=True))(
        k_init, image, pts, calib, labels=colors,
        feat_prior=jnp.zeros((args.batch, 128, 128, 256)))
    params = variables["params"]
    opt_state = tx.init(params)

    def loss_fn(params, batch):
        image, pts, colors, calib, prior = batch
        _, loss = netC.apply({"params": params}, image, pts, calib,
                             labels=colors, feat_prior=prior, train=True)
        return loss

    def step(carry, k):
        params, opt_state = carry
        image, pts, colors, calib = make_batch(k)
        prior = feat_prior_fn(image)
        loss, grads = jax.value_and_grad(loss_fn)(
            params, (image, pts, colors, calib, prior))
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
        print(f"step {done}/{args.steps} mean L1 "
              f"{float(np.asarray(losses.mean())):.4f} "
              f"({time.time() - t0:.0f}s)", flush=True)

    params = state[0]

    @jax.jit
    def heldout(params):
        image, pts, colors, calib = make_batch(
            jax.random.PRNGKey(args.seed + 777))
        prior = feat_prior_fn(image)
        pred = netC.apply({"params": params}, image, pts, calib,
                          feat_prior=prior)
        return jnp.abs(pred - colors).mean()

    err = float(np.asarray(heldout(params)))
    print(f"held-out color L1 (on [-1,1] scale): {err:.4f}", flush=True)
    save_params(args.out, params)
    print(f"saved {args.out}", flush=True)
    return err


if __name__ == "__main__":
    main()
