"""MatteNet training: on-device synthetic human composites + train loop.

The reference demo's segmentation quality comes from pretrained torchhub
models inside ``human_inst_seg`` (RTL/main.py:153-154, README.md:59-60).
This environment has no egress to fetch any weights, so the rebuild trains
its own matting network in-repo on procedurally generated data.

Everything here is jit-compatible and PRNG-keyed: the data generator runs
*inside* the train step on the device, so one host dispatch drives an
arbitrary number of steps with zero host->device data transfer (essential
through this rig's tunneled TPU backend, see DESIGN.md).

Generator design: 2D articulated "capsule humans" — a torso/head/arms/legs
skeleton of capsules with randomized pose, scale and position — textured
with random low-frequency color fields and composited over an unrelated
background texture, plus sensor noise. The matte net's task (separate a
coherent articulated foreground from a textured background) matches the
demo contract; the quality gate lives in tests/test_segmentation.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..pipeline.segmentation import MatteNet, matting_loss


# ---------------------------------------------------------------------------
# procedural capsule humans
# ---------------------------------------------------------------------------

_N_CAPS = 11  # torso, head, 2x upper/lower arm, 2x upper/lower leg


def _rot(theta):
    c, s = jnp.cos(theta), jnp.sin(theta)
    return jnp.stack([jnp.stack([c, -s]), jnp.stack([s, c])])


def _skeleton(key):
    """One random humanoid -> capsule segments a [K,2], b [K,2], r [K].

    Coordinates in math convention (y up) within [-1, 1]^2.
    """
    ks = jax.random.split(key, 16)
    u = lambda k, lo, hi: jax.random.uniform(ks[k], (), minval=lo, maxval=hi)
    scale = u(0, 0.6, 1.05)
    pelvis = jnp.stack([u(1, -0.3, 0.3), u(2, -0.35, 0.05)])
    lean = u(3, -0.25, 0.25)
    up = _rot(lean) @ jnp.array([0.0, 1.0])

    neck = pelvis + up * (0.52 * scale)
    head_c = neck + up * (0.16 * scale)
    torso_r = u(4, 0.11, 0.17) * scale
    head_r = u(5, 0.085, 0.12) * scale

    def limb(k0, root, base_angle, spread, l1, l2, r):
        a1 = base_angle + u(k0, -spread, spread)
        a2 = a1 + u(k0 + 1, -0.9, 0.9)
        d1 = jnp.stack([jnp.cos(a1), jnp.sin(a1)])
        d2 = jnp.stack([jnp.cos(a2), jnp.sin(a2)])
        j1 = root + d1 * (l1 * scale)
        j2 = j1 + d2 * (l2 * scale)
        return [(root, j1, r * scale), (j1, j2, r * scale)]

    down = -jnp.pi / 2 + lean
    segs = [(pelvis, neck, torso_r),
            (head_c, head_c, head_r)]
    # arms hang from the shoulders with wide spread (raised/lowered poses)
    sh_l = neck - _rot(lean) @ jnp.array([0.10 * scale, 0.0])
    sh_r = neck + _rot(lean) @ jnp.array([0.10 * scale, 0.0])
    segs += limb(6, sh_l, down - 0.5, 1.1, 0.26, 0.24, 0.048)
    segs += limb(8, sh_r, down + 0.5, 1.1, 0.26, 0.24, 0.048)
    hip_l = pelvis - _rot(lean) @ jnp.array([0.07 * scale, 0.0])
    hip_r = pelvis + _rot(lean) @ jnp.array([0.07 * scale, 0.0])
    segs += limb(10, hip_l, down - 0.12, 0.35, 0.30, 0.30, 0.062)
    segs += limb(12, hip_r, down + 0.12, 0.35, 0.30, 0.30, 0.062)

    a = jnp.stack([s[0] for s in segs])
    b = jnp.stack([s[1] for s in segs])
    r = jnp.stack([s[2] for s in segs])
    return a, b, r


def _capsule_sdf(grid, a, b, r):
    """grid [S,S,2] x capsules ([K,2],[K,2],[K]) -> min distance [S,S]."""
    p = grid[:, :, None, :] - a[None, None]          # [S,S,K,2]
    ab = (b - a)[None, None]                          # [1,1,K,2]
    denom = jnp.maximum((ab * ab).sum(-1), 1e-8)
    t = jnp.clip((p * ab).sum(-1) / denom, 0.0, 1.0)  # [S,S,K]
    d = jnp.linalg.norm(p - t[..., None] * ab, axis=-1) - r[None, None]
    return d.min(axis=-1)


def _texture(key, grid, contrast=1.0):
    """Random low-frequency RGB color field over grid [S,S,2] -> [S,S,3]."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    base = jax.random.uniform(k1, (1, 1, 3), minval=0.15, maxval=0.85)
    freq = jax.random.uniform(k2, (2, 3), minval=0.5, maxval=4.0)
    phase = jax.random.uniform(k3, (1, 1, 3), minval=0.0, maxval=6.28)
    amp = jax.random.uniform(k4, (1, 1, 3), minval=0.05, maxval=0.35)
    wave = jnp.sin(2 * jnp.pi * (grid[..., :1] * freq[0] +
                                 grid[..., 1:] * freq[1]) + phase)
    return jnp.clip(base + contrast * amp * wave, 0.0, 1.0)


def synth_composite(key, size: int):
    """One composite: (image [S,S,3] in [0,1], alpha [S,S] in {0..1})."""
    k_skel, k_fg, k_bg, k_noise, k_blob, k_keep = jax.random.split(key, 6)
    ax = jnp.linspace(-1.0, 1.0, size)
    gx, gy = jnp.meshgrid(ax, -ax, indexing="xy")    # row 0 = top = +y
    grid = jnp.stack([gx, gy], axis=-1)

    a, b, r = _skeleton(k_skel)
    d = _capsule_sdf(grid, a, b, r)
    alpha = jnp.clip(0.5 - d * (size / 4.0), 0.0, 1.0)  # ~2px soft edge
    # ~15% person-free frames: the matte must reject person-less scenes
    # (the box-prior fallback cannot; the demo's empty-frame behavior
    # depends on this, RTL/main.py:345-358)
    alpha = alpha * jax.random.bernoulli(k_keep, 0.85).astype(alpha.dtype)

    fg = _texture(k_fg, grid)
    # cheap shading cue: darken towards the silhouette edge like a rounded
    # body would (the real demo's person has shading, a flat fg does not)
    shade = 0.7 + 0.3 * jnp.clip(-d * 6.0, 0.0, 1.0)
    bg = _texture(k_bg, grid, contrast=1.4)
    # non-humanoid distractor blobs in the background: the net must key on
    # the articulated silhouette, not "any coherent textured region"
    kb1, kb2, kb3 = jax.random.split(k_blob, 3)
    bc = jax.random.uniform(kb1, (3, 2), minval=-0.9, maxval=0.9)
    br = jax.random.uniform(kb2, (3,), minval=0.08, maxval=0.3)
    bd = jnp.linalg.norm(grid[:, :, None] - bc[None, None], axis=-1) - br
    blob_m = jnp.clip(0.5 - bd.min(-1) * (size / 4.0), 0.0, 1.0)
    bg = bg * (1 - blob_m[..., None]) \
        + _texture(kb3, grid)[..., :3] * blob_m[..., None]
    img = alpha[..., None] * fg * shade[..., None] \
        + (1.0 - alpha[..., None]) * bg
    img = img + jax.random.normal(k_noise, img.shape) * 0.02
    return jnp.clip(img, 0.0, 1.0), alpha


def synth_batch(key, batch: int, size: int):
    """[B,S,S,3] images in [0,1] + [B,S,S] alpha mattes."""
    return jax.vmap(functools.partial(synth_composite, size=size))(
        jax.random.split(key, batch))


# ---------------------------------------------------------------------------
# training
# ---------------------------------------------------------------------------

def make_train_fns(net: MatteNet, size: int, batch: int,
                   learning_rate: float = 1e-3):
    """-> (init_fn(key) -> state, run_fn(state, key, n_steps) -> (state, loss)).

    run_fn executes ``n_steps`` optimizer steps fully on-device (lax.scan;
    fresh synthetic batch per step from the folded key).
    """
    tx = optax.adam(learning_rate)

    def init_fn(key):
        img = jnp.zeros((1, size, size, 3))
        params = net.init(key, img)
        return params, tx.init(params)

    def step(carry, key):
        params, opt_state = carry
        images, alpha = synth_batch(key, batch, size)
        loss, grads = jax.value_and_grad(matting_loss)(
            params, net, images, alpha)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def run_fn(state, key, n_steps: int):
        keys = jax.random.split(key, n_steps)
        state, losses = jax.lax.scan(step, state, keys)
        return state, losses.mean()

    return init_fn, run_fn


def alpha_iou(pred: jax.Array, gt: jax.Array, thresh: float = 0.5):
    """Mean IOU of thresholded mattes over the batch. A person-free frame
    (empty gt) scores 1 when the prediction is also near-empty (<1% area)
    — correct rejection, not a vacuous 0/0."""
    p = pred > thresh
    g = gt > thresh
    inter = (p & g).sum(axis=(1, 2))
    union = (p | g).sum(axis=(1, 2))
    iou = inter / jnp.maximum(union, 1)
    empty_ok = (g.sum(axis=(1, 2)) == 0) & \
        (p.mean(axis=(1, 2)) < 0.01)
    return jnp.where(empty_ok, 1.0, iou).mean()


# ---------------------------------------------------------------------------
# checkpoint io (small flat npz; torch/orbax-free so apps load instantly)
# ---------------------------------------------------------------------------

def save_params(path: str, params, width: int) -> None:
    """Thin wrapper over utils/params_io (same on-disk format: flat f16
    npz with '__width__' as int metadata)."""
    from ..utils.params_io import save_params as _save

    _save(path, params, meta={"width": width})


def load_params(path: str):
    """-> (params pytree (f32), width) from save_params output."""
    from ..utils.params_io import load_params as _load

    params, meta = _load(path)
    return params, meta["width"]
