"""Pixel-aligned feature sampling (the PIFu `index` op).

Reference contract: monoport/lib/modeling/geometry.py:4-16 — bilinear
``grid_sample(feat, uv, align_corners=True)`` with zeros padding, sampling
[B, C, H, W] features at [B, 2, N] normalized coords.

TPU-native design: channel-last features [B, H, W, C] and point-major
coordinates [B, N, 2]; the four bilinear taps become flat gathers over
[H*W, C], which XLA lowers to efficient dynamic-gather and fuses with the
surrounding MLP input concat. A fused Pallas sample+MLP kernel lives in
monoport_tpu/ops/pallas (same semantics, used on the hot path).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample_2d(feat: jax.Array, uv: jax.Array,
                   align_corners: bool = True) -> jax.Array:
    """Bilinear sample of NHWC features at normalized coords.

    Args:
      feat: [B, H, W, C] feature maps.
      uv:   [B, N, 2] coords in [-1, 1]; uv[..., 0] indexes W, uv[..., 1]
            indexes H (torch grid_sample convention).
      align_corners: matches torch semantics; zeros padding outside.

    Returns:
      [B, N, C] sampled features.
    """
    _, h, w, _ = feat.shape
    u, v = uv[..., 0], uv[..., 1]
    if align_corners:
        x = (u + 1.0) * 0.5 * (w - 1)
        y = (v + 1.0) * 0.5 * (h - 1)
    else:
        x = ((u + 1.0) * w - 1.0) * 0.5
        y = ((v + 1.0) * h - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1.0, y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    flat = feat.reshape(feat.shape[0], h * w, feat.shape[3])

    def tap(yi, xi, wgt):
        valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        idx = yc * w + xc  # [B, N]
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)  # [B, N, C]
        # weights computed in f32, applied in the feature dtype so a bf16
        # feature map keeps the whole sample+MLP path in bf16
        return vals * (wgt * valid.astype(jnp.float32)).astype(
            feat.dtype)[..., None]

    out = (tap(y0, x0, wy0 * wx0) + tap(y0, x1, wy0 * wx1)
           + tap(y1, x0, wy1 * wx0) + tap(y1, x1, wy1 * wx1))
    return out


def index(feat: jax.Array, uv: jax.Array) -> jax.Array:
    """PIFu `index`: sample [B,H,W,C] at [B,N,2] -> [B,N,C] (geometry.py:4)."""
    return grid_sample_2d(feat, uv, align_corners=True)
