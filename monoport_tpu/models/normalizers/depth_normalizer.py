"""Depth (z) feature normalizer.

Reference contract: monoport/lib/modeling/normalizers/DepthNormalizer.py:6-40.
Point-major convention: z is [B, N, 1]; the soft-onehot variant returns
[B, N, soft_dim].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class DepthNormalizer:
    """Stateless z-feature normalizer (no parameters)."""

    def __init__(self, soft_onehot: bool = False, soft_dim: int = 64,
                 scale: float = 512 // 2 / 200.0):
        self.soft_onehot = soft_onehot
        self.soft_dim = soft_dim
        self.scale = scale

    def __call__(self, z: jax.Array) -> jax.Array:
        if not self.soft_onehot:
            return z * self.scale
        soft_dim = self.soft_dim
        z_norm = (jnp.clip(z[..., 0], -1.0, 1.0) + 1.0) / 2.0 * (soft_dim - 1)
        z_floor = jnp.floor(z_norm)
        z_ceil = jnp.ceil(z_norm)
        floor_val = 1.0 - (z_norm - z_floor)
        ceil_val = 1.0 - (z_ceil - z_norm)
        onehot_floor = jax.nn.one_hot(z_floor.astype(jnp.int32), soft_dim,
                                      dtype=z.dtype)
        onehot_ceil = jax.nn.one_hot(z_ceil.astype(jnp.int32), soft_dim,
                                     dtype=z.dtype)
        # torch scatter overwrites: when floor == ceil the ceil write wins
        # (DepthNormalizer.py:29-30), so suppress the floor contribution there.
        same = (z_floor == z_ceil)[..., None]
        feat = (jnp.where(same, 0.0, onehot_floor * floor_val[..., None])
                + onehot_ceil * ceil_val[..., None])
        return feat


def PIFuNomalizer(opt=None) -> DepthNormalizer:
    """Factory matching the reference defaults (DepthNormalizer.py:36-41)."""
    if opt is None:
        return DepthNormalizer(soft_onehot=False, scale=512 // 2 / 200.0)
    return DepthNormalizer(
        soft_onehot=opt.get("soft_onehot", False),
        soft_dim=opt.get("soft_dim", 64),
        scale=opt.get("scale", 512 // 2 / 200.0),
    )
