"""Calibrated point projection (reference monoport/lib/modeling/geometry.py:19-55).

Point-major convention: points are [B, N, 3] (TPU-friendly: N is the long,
shardable axis; see monoport_tpu.parallel). Calibrations are [B, 3, 4] or
[B, 4, 4] (extra row ignored), transforms are optional [B, 2, 3] image-space
affines.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _apply_calib(points: jax.Array, calibrations: jax.Array) -> jax.Array:
    rot = calibrations[:, :3, :3]      # [B, 3, 3]
    trans = calibrations[:, :3, 3]     # [B, 3]
    # full fp32: projected coords feed grid_sample; bf16 here shifts taps
    out = jnp.einsum("bij,bnj->bni", rot, points,
                     precision=jax.lax.Precision.HIGHEST)
    return out + trans[:, None, :]


def _apply_transform(xy: jax.Array, transforms: jax.Array) -> jax.Array:
    scale = transforms[:, :2, :2]
    shift = transforms[:, :2, 2]
    out = jnp.einsum("bij,bnj->bni", scale, xy,
                     precision=jax.lax.Precision.HIGHEST)
    return out + shift[:, None, :]


def orthogonal(points: jax.Array, calibrations: jax.Array,
               transforms: jax.Array | None = None) -> jax.Array:
    """Orthographic projection: [B,N,3] x [B,3,4] -> [B,N,3] (geometry.py:19)."""
    xyz = _apply_calib(points, calibrations)
    if transforms is not None:
        xy = _apply_transform(xyz[..., :2], transforms)
        xyz = jnp.concatenate([xy, xyz[..., 2:3]], axis=-1)
    return xyz


def perspective(points: jax.Array, calibrations: jax.Array,
                transforms: jax.Array | None = None) -> jax.Array:
    """Perspective projection with z-divide (geometry.py:37)."""
    homo = _apply_calib(points, calibrations)
    xy = homo[..., :2] / homo[..., 2:3]
    if transforms is not None:
        xy = _apply_transform(xy, transforms)
    return jnp.concatenate([xy, homo[..., 2:3]], axis=-1)


PROJECTIONS = {"orthogonal": orthogonal, "perspective": perspective}
