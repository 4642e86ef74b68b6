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


def bilinear_rows(pos_ndc: jax.Array, size: int) -> jax.Array:
    """[N] normalized positions -> [N, size] bilinear interpolation matrix
    (align_corners=True, zeros outside [-1, 1] — exactly `index`'s tap
    weights, expressed as a dense row so sampling becomes a matmul)."""
    x = (pos_ndc.astype(jnp.float32) + 1.0) * 0.5 * (size - 1)
    j = jnp.arange(size, dtype=jnp.float32)
    # the hat function IS zeros-padding: any tap outside the grid simply
    # has no column, so partially-outside positions keep exactly the
    # in-bounds tap weight the gather form gives them
    return jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - j[None, :]))


def index_grid(feat: jax.Array, u_ndc: jax.Array,
               v_ndc: jax.Array) -> jax.Array:
    """Separable `index` at an OUTER-PRODUCT grid of positions:
    [B, H, W, C] sampled at u_ndc [B, Nu] (W axis) x v_ndc [B, Nv] (H axis)
    -> [B, Nu, Nv, C].

    Identical semantics to ``index`` at the flattened grid points, but the
    four-tap gathers become two separable matmuls (MXU work) — on TPU an
    irregular row gather costs far more than the equivalent dense GEMM
    (r3 ledger: the 257^2 texture gather alone was ~8 ms; DESIGN.md).
    Used by the frontal fast path, where every query lattice (march
    levels, fine ray window, texture rays) is an outer-product grid.
    """
    _, h, w, _ = feat.shape
    wx = jax.vmap(lambda p: bilinear_rows(p, w))(u_ndc)      # [B, Nu, W]
    wy = jax.vmap(lambda p: bilinear_rows(p, h))(v_ndc)      # [B, Nv, H]
    wx = wx.astype(feat.dtype)
    wy = wy.astype(feat.dtype)
    rows = jnp.einsum("bnh,bhwc->bnwc", wy, feat)            # [B, Nv, W, C]
    return jnp.einsum("buw,bnwc->bunc", wx, rows)            # [B, Nu, Nv, C]
