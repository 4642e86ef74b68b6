"""Visible-surface extraction by depth peeling + colorization — dense form.

Reference contract: RTL/recon.py:28-89 (``forward_vertices``) and
RTL/main.py:212-249 (``colorization``). The reference extracts a *sparse*
list of first-hit voxels (X, Y, Z, normal) via nonzero() and splats them
into a canvas. TPU-native redesign: the first-hit test per (x, y) ray is a
dense argmax over the ray axis, so the output is directly a **depth map +
normal map + validity mask** — fully static shapes, no sparse gathers, and
the splat becomes a masked select. Semantics are voxel-for-voxel identical
(verified against the reference in tests/test_recon.py).

Volume convention: vol[i=z, j=y, k=x] (see recon/dense.py). The "front"
viewer looks along -z from z = +1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class SurfaceMaps(NamedTuple):
    depth: jax.Array    # [R, R] float voxel-space depth along the ray axis
    normal: jax.Array   # [R, R, 3] unit normals
    valid: jax.Array    # [R, R] bool — ray hit the surface


def _orient(vol: jax.Array, direction: str) -> jax.Array:
    """Pre-orientation per RTL/recon.py:39-49 (vol in [z, y, x] order)."""
    if direction == "front":
        return vol
    if direction == "left":
        return jnp.transpose(vol, (2, 1, 0))
    if direction == "back":
        return vol[::-1]
    if direction == "right":
        return jnp.transpose(vol[::-1], (2, 1, 0))
    raise ValueError(direction)


def depth_peel(vol: jax.Array, direction: str = "front",
               balance_value: float = 0.5) -> SurfaceMaps:
    """First-hit surface along the view ray (RTL/recon.py:51-89, dense).

    TPU note: the math is identical to the reference's flip+permute view
    ``sdf_all[a, b, c] = vol[R-1-c, b, a]``, but everything reduces along
    vol's leading axis directly — no 17M-element 3D transpose is ever
    materialized; only the final [R, R] maps are (cheaply) transposed.
    """
    r = vol.shape[0]
    vol = _orient(vol, direction)

    # ray enters at i = R-1 (c = 0); first hit = LARGEST occupied i
    # (int32 weights: exact for any R and cheaper than f32 on the VPU)
    occupied = vol > balance_value                         # [i, j, k]
    valid_jk = occupied.any(axis=0)                        # [j, k]
    weights = occupied * jnp.arange(
        1, r + 1, dtype=jnp.int32)[:, None, None]
    i1 = jnp.argmax(weights, axis=0)                       # [j, k]
    c1 = (r - 1) - i1
    c2 = jnp.clip(c1 - 2, 0, r)
    i2 = (r - 1) - c2

    take0 = lambda s, i: jnp.take_along_axis(
        s, i[None], axis=0)[0].astype(jnp.float32)
    v1 = take0(vol, i1)
    v2 = take0(vol, i2)
    # sub-voxel crossing of the 0.5 iso-level between c2 and c1
    denom = v2 - v1
    z = (c2.astype(jnp.float32) * (balance_value - v1)
         + c1.astype(jnp.float32) * (v2 - balance_value)) / denom
    z = jnp.clip(z, 0.0, float(r))

    # normals from 2-voxel backward differences (RTL/recon.py:81-87):
    # v3 at (a, b-2, c1) -> vol[i1, j-2, k]; v4 at (a-2, b, c1) ->
    # vol[i1, j, k-2]; clamped-to-edge like the reference's index clamp
    shift_j = jnp.pad(vol, ((0, 0), (2, 0), (0, 0)), mode="edge")[:, :r]
    shift_k = jnp.pad(vol, ((0, 0), (0, 0), (2, 0)), mode="edge")[..., :r]
    v3 = take0(shift_j, i1)
    v4 = take0(shift_k, i1)
    norm = jnp.stack([v4 - v1, v3 - v1, v2 - v1], axis=-1)
    norm = norm / jnp.linalg.norm(norm, axis=-1, keepdims=True)

    # outputs are indexed [a = x, b = y]: transpose the 2D maps
    t = lambda m: jnp.swapaxes(m, 0, 1)
    return SurfaceMaps(depth=t(z), normal=t(norm), valid=t(valid_jk))


def shade_normal(maps: SurfaceMaps) -> jax.Array:
    """Normal-colored canvas [R, R, 3] (RTL/main.py:219-225); white bg."""
    color = jnp.clip((maps.normal + 1.0) * 0.5, 0.0, 1.0)
    return jnp.where(maps.valid[..., None], color, 1.0)


def surface_world_points(maps: SurfaceMaps, resolution: int,
                         b_min=(-1.0, -1.0, -1.0),
                         b_max=(1.0, 1.0, 1.0)) -> jax.Array:
    """World coords of every (a, b) surface pixel -> [R*R, 3].

    Mirrors the voxel->world map of RTL/main.py:204-210 & 229-237:
    world = b_min + (length / R) * (X, Y, R - Z).
    """
    r = resolution
    a = jnp.arange(r, dtype=jnp.float32)
    aa, bb = jnp.meshgrid(a, a, indexing="ij")
    zz = float(r) - maps.depth
    vox = jnp.stack([aa, bb, zz], axis=-1).reshape(-1, 3)
    b_min = jnp.asarray(b_min, jnp.float32)
    b_max = jnp.asarray(b_max, jnp.float32)
    return vox * (b_max - b_min) / r + b_min


def colorize(maps: SurfaceMaps, query_color_fn, resolution: int,
             b_min=(-1.0, -1.0, -1.0), b_max=(1.0, 1.0, 1.0)) -> jax.Array:
    """netC-textured canvas [R, R, 3] (RTL/main.py:229-249); white bg.

    ``query_color_fn(points[1, N, 3]) -> [1, N, 3]`` in [-1, 1] (tanh).
    """
    pts = surface_world_points(maps, resolution, b_min, b_max)
    color = query_color_fn(pts[None])[0] * 0.5 + 0.5
    color = color.reshape(resolution, resolution, 3)
    return jnp.where(maps.valid[..., None], color, 1.0)


def visualize(canvas: jax.Array, render_size: int = 256):
    """rot90 + nearest-resize + background mask (RTL/main.py:252-281).

    Returns (image [S, S, 3] in [0, 1], mask [S, S, 1] bool).
    """
    from ..ops.resize import interpolate_2d

    img = jnp.rot90(canvas, 1, axes=(0, 1))
    img = interpolate_2d(img[None], (render_size, render_size),
                         "nearest")[0]
    bg = (img >= 1.0).all(axis=-1, keepdims=True)
    return img, ~bg
