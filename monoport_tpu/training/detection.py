"""DetectNet training: multi-person synthetic scenes + CenterNet-style loss.

Completes the human_det story (SURVEY §2.3): the reference demo's detector
is a pretrained torchhub model consumed inside ``human_inst_seg``
(README.md:16-19, requirements.txt:12). Round 1 collapsed it into an
alpha->bbox reduction; this module trains a real image->boxes detector
in-repo so the demo no longer needs a fixed rectangle prior.

Scene generator: 0-2 articulated capsule humans (training/matting.py's
skeleton) at independent random scales/positions over a textured
background with distractor blobs. Ground truth is one xyxy box + validity
flag per instance slot — static shapes, fully on-device, PRNG-keyed, so
the whole train loop is one lax.scan program (zero host->device traffic
through the tunneled backend, DESIGN.md).

Loss: penalty-reduced focal loss on a Gaussian-splatted center heatmap +
L1 on size/offset at ground-truth centers — the anchor-free CenterNet
recipe, which maps to TPU cleanly (dense conv heads, static top-k decode,
no dynamic-shape NMS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..pipeline.detection import DetectNet, gaussian_heatmap
from .matting import _capsule_sdf, _skeleton, _texture

MAX_PEOPLE = 4


def _person_alpha(key, grid, size: int):
    """One randomly placed/scaled person -> (alpha [S,S], present flag).

    Scale spans 0.25-1.1 (near/far extremes — r3 hardening, VERDICT r2
    item 7) and placement the full frame width, so instances overlap and
    occlude each other routinely."""
    k_skel, k_place, k_keep = jax.random.split(key, 3)
    a, b, r = _skeleton(k_skel)
    ks = jax.random.split(k_place, 3)
    s = jax.random.uniform(ks[0], (), minval=0.25, maxval=1.1)
    t = jnp.stack([jax.random.uniform(ks[1], (), minval=-0.65, maxval=0.65),
                   jax.random.uniform(ks[2], (), minval=-0.35, maxval=0.35)])
    a = a * s + t
    b = b * s + t
    r = r * s
    d = _capsule_sdf(grid, a, b, r)
    alpha = jnp.clip(0.5 - d * (size / 4.0), 0.0, 1.0)
    return alpha, k_keep


def _alpha_bbox(alpha, thresh: float = 0.5):
    """[S,S] alpha -> xyxy box in pixels (0s when empty) + found flag."""
    s_y, s_x = alpha.shape
    mask = alpha > thresh
    any_row = mask.any(axis=1)
    any_col = mask.any(axis=0)
    rows = jnp.arange(s_y)
    cols = jnp.arange(s_x)
    big = jnp.iinfo(jnp.int32).max
    y1 = jnp.min(jnp.where(any_row, rows, big))
    y2 = jnp.max(jnp.where(any_row, rows, -1))
    x1 = jnp.min(jnp.where(any_col, cols, big))
    x2 = jnp.max(jnp.where(any_col, cols, -1))
    found = mask.any()
    box = jnp.stack([x1, y1, x2, y2]).astype(jnp.float32)
    return jnp.where(found, box, 0.0), found


def synth_scene(key, size: int):
    """-> (image [S,S,3] in [0,1], boxes [MAX_PEOPLE,4] xyxy px,
    valid [MAX_PEOPLE] bool). 0-4 people (slot presence 90/50/35/25%),
    round blobs AND person-shaped single-capsule distractors as hard
    negatives (an articulated human has limbs; a bare capsule does not)."""
    keys = jax.random.split(key, MAX_PEOPLE + 4)
    ax = jnp.linspace(-1.0, 1.0, size)
    gx, gy = jnp.meshgrid(ax, -ax, indexing="xy")
    grid = jnp.stack([gx, gy], axis=-1)

    bg = _texture(keys[0], grid, contrast=1.4)
    kb1, kb2, kb3 = jax.random.split(keys[1], 3)
    bc = jax.random.uniform(kb1, (5, 2), minval=-0.9, maxval=0.9)
    br = jax.random.uniform(kb2, (5,), minval=0.06, maxval=0.3)
    bd = jnp.linalg.norm(grid[:, :, None] - bc[None, None], axis=-1) - br
    blob_m = jnp.clip(0.5 - bd.min(-1) * (size / 4.0), 0.0, 1.0)
    bg = bg * (1 - blob_m[..., None]) \
        + _texture(kb3, grid)[..., :3] * blob_m[..., None]
    # capsule distractors: elongated, person-ish, textured — NOT labeled
    kd1, kd2, kd3, kd4 = jax.random.split(keys[2], 4)
    da = jax.random.uniform(kd1, (2, 2), minval=-0.8, maxval=0.8)
    db = da + jax.random.uniform(kd2, (2, 2), minval=-0.5, maxval=0.5)
    dr = jax.random.uniform(kd3, (2,), minval=0.04, maxval=0.12)
    dd = _capsule_sdf(grid, da, db, dr)
    dist_m = jnp.clip(0.5 - dd * (size / 4.0), 0.0, 1.0)
    bg = bg * (1 - dist_m[..., None]) \
        + _texture(kd4, grid)[..., :3] * dist_m[..., None]

    img = bg
    boxes, valids = [], []
    present_p = (0.9, 0.5, 0.35, 0.25)
    for i in range(MAX_PEOPLE):
        alpha, k_keep = _person_alpha(keys[3 + i], grid, size)
        present = jax.random.bernoulli(k_keep, present_p[i])
        alpha = alpha * present.astype(alpha.dtype)
        k_fg = jax.random.fold_in(keys[3 + i], 7)
        fg = _texture(k_fg, grid)
        d_shade = 1.0 - alpha  # cheap edge-darkening stand-in
        img = alpha[..., None] * fg * (0.7 + 0.3 * (1 - d_shade[..., None])) \
            + (1.0 - alpha[..., None]) * img
        box, found = _alpha_bbox(alpha)
        boxes.append(box)
        valids.append(present & found)
    img = img + jax.random.normal(keys[-1], img.shape) * 0.02
    return (jnp.clip(img, 0.0, 1.0), jnp.stack(boxes),
            jnp.stack(valids))


def synth_det_batch(key, batch: int, size: int):
    """-> images [B,S,S,3], boxes [B,K,4], valid [B,K]."""
    return jax.vmap(functools.partial(synth_scene, size=size))(
        jax.random.split(key, batch))


# ---------------------------------------------------------------------------
# loss
# ---------------------------------------------------------------------------

def detection_loss(variables, net: DetectNet, images, gt_boxes, gt_valid):
    """Focal heatmap + L1 size/offset loss (CenterNet recipe).

    gt_boxes [B,K,4] xyxy pixels, gt_valid [B,K] bool.
    """
    heat, size_p, off_p = net.apply(variables, images * 2.0 - 1.0)
    b, g, _, _ = heat.shape
    stride = images.shape[1] // g

    cx = (gt_boxes[..., 0] + gt_boxes[..., 2]) / 2.0 / stride  # [B,K] grid
    cy = (gt_boxes[..., 1] + gt_boxes[..., 3]) / 2.0 / stride
    w = (gt_boxes[..., 2] - gt_boxes[..., 0]) / stride
    h = (gt_boxes[..., 3] - gt_boxes[..., 1]) / stride

    gt_heat = gaussian_heatmap(cx, cy, w, h, gt_valid, g)        # [B,G,G]
    p = jax.nn.sigmoid(heat[..., 0])
    p = jnp.clip(p, 1e-5, 1.0 - 1e-5)
    pos = (gt_heat >= 0.999).astype(p.dtype)
    focal = -(pos * (1 - p) ** 2 * jnp.log(p)
              + (1 - pos) * (1 - gt_heat) ** 4 * p ** 2 * jnp.log(1 - p))
    n_pos = jnp.maximum(pos.sum(), 1.0)
    loss_heat = focal.sum() / n_pos

    ix = jnp.clip(cx.astype(jnp.int32), 0, g - 1)                # [B,K]
    iy = jnp.clip(cy.astype(jnp.int32), 0, g - 1)
    bi = jnp.arange(b)[:, None]
    sz_at = size_p[bi, iy, ix]                                   # [B,K,2]
    off_at = off_p[bi, iy, ix]                                   # [B,K,2]
    v = gt_valid.astype(p.dtype)[..., None]
    # log-extent targets (decode exponentiates): scale-equalized so the
    # 0.25x near/far instances train as strongly as the big ones
    gt_sz = jnp.log(jnp.maximum(jnp.stack([w, h], -1), 0.25))
    l1_sz = (jnp.abs(sz_at - gt_sz) * v).sum() / n_pos
    gt_off = jnp.stack([cx - (ix + 0.5), cy - (iy + 0.5)], -1)
    l1_off = (jnp.abs(off_at - gt_off) * v).sum() / n_pos
    return loss_heat + 0.5 * l1_sz + l1_off


# ---------------------------------------------------------------------------
# train loop (scan-over-steps, same shape as training/matting.py)
# ---------------------------------------------------------------------------

def make_train_fns(net: DetectNet, size: int, batch: int,
                   learning_rate: float = 1e-3, total_steps: int = 0):
    """-> (init_fn(key) -> state, run_fn(state, key, n_steps)).

    total_steps > 0 adds a cosine decay to 5% of the peak lr."""
    lr = (optax.cosine_decay_schedule(learning_rate, total_steps,
                                      alpha=0.05)
          if total_steps else learning_rate)
    tx = optax.adam(lr)

    def init_fn(key):
        img = jnp.zeros((1, size, size, 3))
        params = net.init(key, img)
        return params, tx.init(params)

    def step(carry, key):
        params, opt_state = carry
        images, boxes, valid = synth_det_batch(key, batch, size)
        loss, grads = jax.value_and_grad(detection_loss)(
            params, net, images, boxes, valid)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    def run_fn(state, key, n_steps: int):
        keys = jax.random.split(key, n_steps)
        state, losses = jax.lax.scan(step, state, keys)
        return state, losses.mean()

    return init_fn, run_fn


def box_iou(a, b):
    """xyxy box IOU, elementwise over leading dims."""
    x1 = jnp.maximum(a[..., 0], b[..., 0])
    y1 = jnp.maximum(a[..., 1], b[..., 1])
    x2 = jnp.minimum(a[..., 2], b[..., 2])
    y2 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area = lambda z: jnp.clip(z[..., 2] - z[..., 0], 0) \
        * jnp.clip(z[..., 3] - z[..., 1], 0)
    return inter / jnp.maximum(area(a) + area(b) - inter, 1e-6)
