"""Spherical-harmonics shading (2nd order, 9 coefficients).

Reference contracts: the GLSL ``evaluateH`` irradiance basis
(gl/shaders/sh.fs:27-41, Ramamoorthi-Hanrahan constants) used by ShRender,
and the per-vertex SH band rotation of prt.vs:45-131 used by PrtRender —
here replaced by an exact 9x9 rotation matrix built by evaluating the
basis on rotated sample directions (least squares; exact because SH bands
are closed under rotation).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

_C1, _C2, _C3, _C4, _C5 = 0.429043, 0.511664, 0.743125, 0.886227, 0.247708


def evaluate_irradiance_basis(normals):
    """[..., 3] unit normals -> [..., 9] irradiance basis H (sh.fs:27-41)."""
    x, y, z = normals[..., 0], normals[..., 1], normals[..., 2]
    stack = jnp.stack if hasattr(normals, "device") else np.stack
    one = x * 0 + 1.0
    return stack([
        _C4 * one,
        2.0 * _C2 * y,
        2.0 * _C2 * z,
        2.0 * _C2 * x,
        2.0 * _C1 * x * y,
        2.0 * _C1 * y * z,
        _C3 * z * z - _C5,
        2.0 * _C1 * z * x,
        _C1 * (x * x - y * y),
    ], axis=-1)


def evaluate_sh_basis(dirs):
    """Real SH basis Y_lm up to l=2: [..., 3] -> [..., 9] (prt.fs order)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    stack = jnp.stack if hasattr(dirs, "device") else np.stack
    one = x * 0 + 1.0
    return stack([
        0.282095 * one,
        -0.488603 * y,
        0.488603 * z,
        -0.488603 * x,
        1.092548 * x * y,
        -1.092548 * y * z,
        0.315392 * (3 * z * z - 1),
        -1.092548 * x * z,
        0.546274 * (x * x - y * y),
    ], axis=-1)


def _fibonacci_dirs(n: int = 64) -> np.ndarray:
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return np.stack([np.sin(phi) * np.cos(theta),
                     np.sin(phi) * np.sin(theta), np.cos(phi)], -1)


def sh_rotation_matrix(rot: np.ndarray) -> np.ndarray:
    """Exact 9x9 SH rotation for a 3x3 rotation (replaces prt.vs band
    rotation): solve B(d) R_sh = B(R d) over sample directions."""
    dirs = _fibonacci_dirs(128)
    basis = evaluate_sh_basis(dirs)                   # [N, 9]
    basis_rot = evaluate_sh_basis(dirs @ np.asarray(rot).T)
    sol, *_ = np.linalg.lstsq(basis, basis_rot, rcond=None)
    return sol.T                                      # coeffs' = R_sh @ coeffs


def shade_sh(normals, sh_coeffs):
    """Irradiance from 9x3 environment coefficients: [..., 3] normals ->
    [..., 3] rgb (sh.fs evaluateLightingModel)."""
    h = evaluate_irradiance_basis(normals)            # [..., 9]
    return h @ jnp.asarray(sh_coeffs)                 # [..., 3]
