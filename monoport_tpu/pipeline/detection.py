"""Human detection (human_det replacement, SURVEY §2.3).

Reference contract: ``human_det`` is a pretrained person detector consumed
inside ``human_inst_seg`` (requirements.txt:12, README.md:16-19); its boxes
focus the segmenter on the person region (RTL/main.py:345-350 passes
``scaled_boxes``). Round 1 stood in a fixed rectangle prior; this module is
a real image->boxes detector trained in-repo (apps/train_detection.py) on
synthetic capsule-human scenes.

TPU-native design: anchor-free center-point detection (CenterNet style) —
a small strided conv encoder to a G=S/16 grid with three dense 1x1 heads
(center heatmap, box size, sub-cell offset), decoded by a 3x3 max-pool
peak test + static top-k. Everything is static-shape and jit-compatible;
no dynamic-shape NMS anywhere.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

STRIDE = 16
MAX_DET = 4  # instance slots (matches training/detection.py MAX_PEOPLE)


class _ConvGNRelu(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False)(x)
        x = nn.GroupNorm(num_groups=min(16, self.features), epsilon=1e-5)(x)
        return nn.relu(x)


class DetectNet(nn.Module):
    """[B,S,S,3] (in [-1,1]) -> (heat [B,G,G,1] logits, size [B,G,G,2]
    (LOG w,h in grid units), offset [B,G,G,2]), G = S // stride.

    stride 8 (3 downsamples) doubles localization resolution over the
    r2 stride-16 net — the box-IOU ceiling on small instances is set by
    the output grid pitch (CenterNet runs stride 4)."""
    width: int = 16
    stride: int = 16

    @nn.compact
    def __call__(self, x):
        import math
        w = self.width
        n_down = int(math.log2(self.stride))
        assert 2 ** n_down == self.stride and 2 <= n_down <= 4
        for mult in (1, 2, 4, 4)[:n_down]:
            x = _ConvGNRelu(w * mult, stride=2)(x)
            x = _ConvGNRelu(w * mult)(x)
        x = _ConvGNRelu(w * 4)(x)
        heat = nn.Conv(1, (1, 1),
                       bias_init=nn.initializers.constant(-2.19))(x)
        size = nn.Conv(2, (1, 1))(x)
        off = nn.Conv(2, (1, 1))(x)
        return heat, size, off


def gaussian_heatmap(cx, cy, w, h, valid, g: int):
    """Splat per-instance Gaussians -> [B,G,G] target heatmap.

    cx/cy/w/h [B,K] in grid units; sigma follows the CenterNet
    radius-from-box heuristic (~1/6 of the smaller box side). The cell
    CONTAINING each center is snapped to exactly 1.0: cell sample points
    sit at half-integers, so the continuous Gaussian alone never reaches
    1 and the focal loss's positive set (gt == 1) would be empty — the
    detector then collapses to predicting nothing (observed: first
    training run, held-out IOU 0.0)."""
    ys = jnp.arange(g, dtype=jnp.float32) + 0.5
    xs = jnp.arange(g, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")          # [G,G]
    sigma = jnp.maximum(jnp.minimum(w, h) / 6.0, 0.75)    # [B,K]
    d2 = ((gx[None, None] - cx[..., None, None]) ** 2
          + (gy[None, None] - cy[..., None, None]) ** 2)  # [B,K,G,G]
    heat = jnp.exp(-d2 / (2.0 * sigma[..., None, None] ** 2))
    ii = jnp.arange(g, dtype=jnp.float32)
    in_x = (jnp.floor(jnp.clip(cx, 0, g - 1))[..., None, None]
            == ii[None, None, None, :])                   # [B,K,1,G]
    in_y = (jnp.floor(jnp.clip(cy, 0, g - 1))[..., None, None]
            == ii[None, None, :, None])                   # [B,K,G,1]
    heat = jnp.maximum(heat, (in_x & in_y).astype(heat.dtype))
    heat = heat * valid[..., None, None].astype(heat.dtype)
    return heat.max(axis=1)                               # [B,G,G]


def decode(heat, size, off, stride: int = STRIDE, k: int = MAX_DET):
    """Head outputs -> (boxes [B,k,4] xyxy pixels, probs [B,k]).

    Peak = cell that survives a 3x3 max-pool equality test (the standard
    static-shape NMS surrogate), then top-k by score. The size head
    regresses LOG grid extents (multi-scale friendly: a 0.25x and a 1.1x
    person get equal relative loss; raw-extent L1 let small boxes drift)."""
    b, g, _, _ = heat.shape
    p = jax.nn.sigmoid(heat[..., 0])                      # [B,G,G]
    pmax = nn.max_pool(p[..., None], (3, 3), strides=(1, 1),
                       padding="SAME")[..., 0]
    score = jnp.where(p >= pmax, p, 0.0).reshape(b, g * g)
    top, idx = jax.lax.top_k(score, k)                    # [B,k]
    iy, ix = idx // g, idx % g
    bi = jnp.arange(b)[:, None]
    ox = off[bi, iy, ix, 0]
    oy = off[bi, iy, ix, 1]
    wg = jnp.exp(jnp.clip(size[bi, iy, ix, 0], -4.0, 4.0))
    hg = jnp.exp(jnp.clip(size[bi, iy, ix, 1], -4.0, 4.0))
    cx = (ix + 0.5 + ox) * stride
    cy = (iy + 0.5 + oy) * stride
    boxes = jnp.stack([cx - wg * stride / 2, cy - hg * stride / 2,
                       cx + wg * stride / 2, cy + hg * stride / 2], axis=-1)
    return boxes, top


class Detection:
    """Callable detector matching human_det's role: images -> boxes.

    ``det(images [B,S,S,3] in [0,1]) -> (boxes [B,MAX_DET,4] xyxy px,
    probs [B,MAX_DET])``, sorted by score descending.
    """

    def __init__(self, variables, width: int = 16, stride: int = STRIDE):
        self.net = DetectNet(width=width, stride=stride)
        self.stride = stride
        self.variables = variables
        self._call = jax.jit(self._impl)
        self._person_box = jax.jit(self._person_box_impl)

    @classmethod
    def load_default(cls, ckpt_path: Optional[str] = None
                     ) -> Optional["Detection"]:
        """Detector with the committed in-repo weights
        (apps/train_detection.py); None if the checkpoint is absent."""
        import os

        if ckpt_path is None:
            ckpt_path = os.path.join(os.path.dirname(__file__), os.pardir,
                                     "data", "detectnet.npz")
        if not os.path.exists(ckpt_path):
            return None
        from ..utils.params_io import load_params

        params, meta = load_params(ckpt_path)
        return cls({"params": params}, width=meta.get("width", 16),
                   stride=meta.get("stride", 16))

    def _impl(self, images):
        heat, size, off = self.net.apply(self.variables, images * 2.0 - 1.0)
        return decode(heat, size, off, stride=self.stride)

    def __call__(self, images: jax.Array):
        return self._call(images)

    def person_box(self, images: jax.Array, pad: float = 0.15,
                   min_prob: float = 0.3,
                   fallback: Optional[jax.Array] = None):
        """[B,S,S,3] -> [B,4] single detection region for the segmenter:
        the union of confident instance boxes, padded by ``pad`` x box
        size, clipped to the frame; ``fallback`` (or the full frame) when
        nothing is confident. This is exactly the scaled_boxes input of
        the reference's Segmentation (RTL/main.py:345-350).

        The whole decode+union reduction runs in ONE jitted dispatch —
        un-jitted per-frame jnp ops are very slow on the tunneled TPU
        backend (CLAUDE.md), and this runs once per demo frame."""
        s = images.shape[1]
        if fallback is None:
            fallback = jnp.asarray([0.0, 0.0, s - 1.0, s - 1.0])
        return self._person_box(images, jnp.float32(pad),
                                jnp.float32(min_prob),
                                jnp.asarray(fallback, jnp.float32))

    def _person_box_impl(self, images, pad, min_prob, fallback):
        s = images.shape[1]
        heat, size, off = self.net.apply(self.variables, images * 2.0 - 1.0)
        boxes, probs = decode(heat, size, off, stride=self.stride)
        conf = probs > min_prob                            # [B,K]
        big = jnp.float32(1e9)
        x1 = jnp.min(jnp.where(conf, boxes[..., 0], big), axis=1)
        y1 = jnp.min(jnp.where(conf, boxes[..., 1], big), axis=1)
        x2 = jnp.max(jnp.where(conf, boxes[..., 2], -big), axis=1)
        y2 = jnp.max(jnp.where(conf, boxes[..., 3], -big), axis=1)
        w = x2 - x1
        h = y2 - y1
        out = jnp.stack([x1 - pad * w, y1 - pad * h,
                         x2 + pad * w, y2 + pad * h], axis=-1)
        out = jnp.clip(out, 0.0, s - 1.0)
        fallback = jnp.broadcast_to(fallback, out.shape)
        found = conf.any(axis=1)[:, None]
        return jnp.where(found, out, fallback)
