"""Dense occupancy-grid evaluation.

Volume convention (shared across monoport_tpu.recon, chosen to match the
consumer side of the reference — RTL/recon.py:28-89 and the colorization
voxel->world mapping in RTL/main.py:204-249):

    vol[i, j, k] = occ(x = lerp(b_min_x, b_max_x, k / (R-1)),
                       y = lerp(b_min_y, b_max_y, j / (R-1)),
                       z = lerp(b_min_z, b_max_z, i / (R-1)))

i.e. axis 0 is z (the "front" viewing ray enters at i = R-1), axis 1 is y,
axis 2 is x.

``query_fn(points[1, N, 3]) -> [1, N, 1]`` follows the reference
query_func contract (RTL/main.py:168-183).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

QueryFn = Callable[[jax.Array], jax.Array]


def grid_points(resolution: int, b_min=(-1.0, -1.0, -1.0),
                b_max=(1.0, 1.0, 1.0)) -> jax.Array:
    """[R^3, 3] world coords in volume order (z-major, x-fastest)."""
    b_min = np.asarray(b_min, np.float32)
    b_max = np.asarray(b_max, np.float32)
    r = jnp.linspace(0.0, 1.0, resolution, dtype=jnp.float32)
    zz, yy, xx = jnp.meshgrid(r, r, r, indexing="ij")
    unit = jnp.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    return unit * (b_max - b_min) + b_min


def index_to_world(idx_xyz: jax.Array, resolution: int,
                   b_min=(-1.0, -1.0, -1.0), b_max=(1.0, 1.0, 1.0)) -> jax.Array:
    """[..., 3] integer (x, y, z) voxel indices -> world coords."""
    b_min = jnp.asarray(b_min, jnp.float32)
    b_max = jnp.asarray(b_max, jnp.float32)
    unit = idx_xyz.astype(jnp.float32) / (resolution - 1)
    return unit * (b_max - b_min) + b_min


def dense_eval(query_fn: QueryFn, resolution: int,
               b_min=(-1.0, -1.0, -1.0), b_max=(1.0, 1.0, 1.0),
               chunk: int = 262144) -> jax.Array:
    """Evaluate the full R^3 grid in fixed-size chunks -> vol [R, R, R]."""
    pts = grid_points(resolution, b_min, b_max)
    n = pts.shape[0]
    pad = (-n) % chunk
    pts = jnp.pad(pts, ((0, pad), (0, 0)))
    batches = pts.reshape(-1, chunk, 3)

    def body(batch):
        return query_fn(batch[None])[0, :, 0]

    occ = jax.lax.map(body, batches).reshape(-1)[:n]
    return occ.reshape(resolution, resolution, resolution)
