"""Image/volume resampling as dense matrix products.

TPU-first design note: arbitrary-size separable interpolation (nearest /
bilinear / bicubic, matching ``torch.nn.functional.interpolate`` semantics,
cf. reference monoport/lib/modeling/backbones/HGFilters.py:108) is expressed
as small dense [out, in] weight matrices applied per axis with einsum. XLA
maps these straight onto the MXU and fuses the surrounding elementwise ops,
which beats gather-based interpolation on TPU for the regular-grid case.

All ops are NHWC (channel-last), the TPU-native layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _source_coords(out_size: int, in_size: int, align_corners: bool) -> np.ndarray:
    """Continuous source coordinate for each output index (torch semantics)."""
    i = np.arange(out_size, dtype=np.float64)
    if in_size == 1:
        return np.zeros(out_size, dtype=np.float64)
    if align_corners:
        if out_size == 1:
            return np.zeros(out_size, dtype=np.float64)
        return i * (in_size - 1) / (out_size - 1)
    return (i + 0.5) * in_size / out_size - 0.5


def _cubic_weight(t: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel (Keys, a=-0.75; matches torch/opencv)."""
    at = np.abs(t)
    f1 = ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    f2 = ((a * at - 5.0 * a) * at + 8.0 * a) * at - 4.0 * a
    return np.where(at <= 1.0, f1, np.where(at < 2.0, f2, 0.0))


@functools.lru_cache(maxsize=None)
def _resize_matrix(
    in_size: int, out_size: int, mode: str, align_corners: bool
) -> np.ndarray:
    """Dense [out_size, in_size] interpolation matrix for one axis."""
    src = _source_coords(out_size, in_size, align_corners)
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if mode == "bilinear":
        x0 = np.floor(src).astype(np.int64)
        frac = src - x0
        for tap, w in ((x0, 1.0 - frac), (x0 + 1, frac)):
            tapc = np.clip(tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), tapc), w)
    elif mode == "bicubic":
        x0 = np.floor(src).astype(np.int64)
        for k in range(-1, 3):
            tap = x0 + k
            w = _cubic_weight(src - tap)
            # torch clamps out-of-range taps to the border (replication)
            tapc = np.clip(tap, 0, in_size - 1)
            np.add.at(mat, (np.arange(out_size), tapc), w)
    else:
        raise ValueError(f"unknown interpolation mode: {mode}")
    return mat.astype(np.float32)


def resize_axis(x: jax.Array, axis: int, out_size: int, mode: str,
                align_corners: bool = True) -> jax.Array:
    """Resize one axis of ``x`` with a dense interpolation matmul."""
    in_size = x.shape[axis]
    if in_size == out_size and mode != "bicubic":
        return x
    if mode == "nearest":
        # torch 'nearest': floor(i * in/out); gather, no matmul needed.
        idx = np.floor(
            np.arange(out_size, dtype=np.float64) * in_size / out_size
        ).astype(np.int32)
        return jnp.take(x, jnp.asarray(idx), axis=axis)
    mat = jnp.asarray(_resize_matrix(in_size, out_size, mode, align_corners))
    moved = jnp.moveaxis(x, axis, -1)
    out = jnp.einsum(
        "...i,oi->...o", moved, mat.astype(x.dtype),
        precision=jax.lax.Precision.HIGHEST,
    )
    return jnp.moveaxis(out, -1, axis)


def interpolate_2d(x: jax.Array, size: tuple[int, int], mode: str = "bilinear",
                   align_corners: bool = True) -> jax.Array:
    """NHWC resize matching ``F.interpolate`` (reference MonoPortNet.py:42)."""
    x = resize_axis(x, 1, size[0], mode, align_corners)
    x = resize_axis(x, 2, size[1], mode, align_corners)
    return x


def upsample2x_bicubic(x: jax.Array) -> jax.Array:
    """2x bicubic upsample, align_corners=True (HGFilters.py:108 semantics)."""
    b, h, w, c = x.shape
    return interpolate_2d(x, (h * 2, w * 2), "bicubic", align_corners=True)


def interpolate_3d(vol: jax.Array, size: tuple[int, int, int],
                   mode: str = "bilinear", align_corners: bool = True) -> jax.Array:
    """Separable volume resize for [..., D, H, W] grids.

    Used by the hierarchical occupancy evaluator to upsample 2^k+1 level
    grids (exact nesting under align_corners=True), replacing the CUDA
    interpolation kernels of ImplicitSegCUDA (SURVEY §2.3).
    """
    vol = resize_axis(vol, -3, size[0], mode, align_corners)
    vol = resize_axis(vol, -2, size[1], mode, align_corners)
    vol = resize_axis(vol, -1, size[2], mode, align_corners)
    return vol


def avg_pool_2d(x: jax.Array, window: int = 2, stride: int | None = None) -> jax.Array:
    """NHWC average pooling (torch F.avg_pool2d equivalent)."""
    stride = stride or window
    out = jax.lax.reduce_window(
        x, 0.0, jax.lax.add,
        (1, window, window, 1), (1, stride, stride, 1), "VALID",
    )
    return out / float(window * window)
