"""Hierarchical "lossless" surface localization — TPU-native.

This replaces the reference's external CUDA component ImplicitSegCUDA
(``Seg3dLossless``; call sites RTL/main.py:185-195, behavior in SURVEY
§2.3): evaluate a dense coarse grid, then at each finer 2^k+1 level
trilinearly upsample the occupancy and re-evaluate **only** voxels near
the 0.5 iso-surface (plus dilation), writing results into the dense
volume. ~90k of 17M points evaluated per 257³ frame at IOU 1.0.

TPU-first redesign (vs the reference's dynamic octree):
  * every level has a **static shape**: candidate voxels are compacted
    into a fixed-budget padded index buffer — no dynamic shapes, one
    compile;
  * compaction and write-back are scatter-free (ops/compaction.py:
    batched cumsum + binary-search gathers + rank-field gather), because
    TPU scalar scatters measure ~150ms at volume scale;
  * upsampling is the separable matmul interpolation of ops/resize.py
    (exact on the nested 2^k+1 grids, align_corners=True);
  * boundary detection + dilation are elementwise shift-ors (VPU).

The band threshold ``tau`` plus dilation plays the role of the reference's
``balance_value``/dilation; budgets mirror the fixed-evaluation idea of its
Seg3dTopk variant, which fits XLA better than true subdivision.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from ..ops.compaction import dilate_mask, rank_writeback, select_k
from ..ops.resize import interpolate_3d
from .dense import QueryFn, dense_eval, grid_points, index_to_world


@dataclasses.dataclass(frozen=True)
class HierarchicalRecon:
    """Coarse-to-fine occupancy reconstruction with static shapes.

    Args mirror the reference Seg3dLossless constructor (RTL/main.py:188-195)
    with TPU additions (budgets / tau / dilate).
    """
    resolutions: Sequence[int] = (17, 33, 65, 129, 257)
    b_min: tuple = (-1.0, -1.0, -1.0)
    b_max: tuple = (1.0, 1.0, 1.0)
    balance_value: float = 0.5
    budgets: Sequence[int] = (0, 16384, 65536, 131072, 262144)
    boundary_tau: float = 0.2
    dilate: int = 1
    # 'uncertain' (default): two-tier priority by |occ - balance| so budget
    # overflow drops the most-confident voxels first — the Seg3dTopk
    # fixed-budget idea (SURVEY §2.3). 'first': first-K candidates in scan
    # order (cheapest, but overflow silently never refines the far side of
    # the volume — only safe when budgets provably exceed the band).
    select: str = "uncertain"

    def __post_init__(self):
        assert len(self.budgets) == len(self.resolutions)
        for coarse, fine in zip(self.resolutions[:-1], self.resolutions[1:]):
            assert fine == 2 * coarse - 1, (
                "resolutions must be nested 2^k+1 grids")

    def __call__(self, query_fn: QueryFn,
                 return_counts: bool = False):
        """-> vol [R, R, R] (optionally with per-level candidate counts)."""
        res0 = self.resolutions[0]
        pts0 = grid_points(res0, self.b_min, self.b_max)
        occ = query_fn(pts0[None])[0, :, 0].reshape(res0, res0, res0)

        counts = []
        for res, budget in zip(self.resolutions[1:], self.budgets[1:]):
            occ = self._refine_level(query_fn, occ, res, budget, counts)
        if return_counts:
            return occ, counts
        return occ

    def _refine_level(self, query_fn: QueryFn, occ_coarse: jax.Array,
                      res: int, budget: int, counts: list) -> jax.Array:
        occ_up = interpolate_3d(occ_coarse, (res, res, res))
        band = jnp.abs(occ_up - self.balance_value) < self.boundary_tau
        band = dilate_mask(band, self.dilate)
        # points on the coarse lattice (all-even indices) are already exact
        even = (jnp.arange(res) % 2) == 0
        coarse_pt = (even[:, None, None] & even[None, :, None]
                     & even[None, None, :])
        cand = band & ~coarse_pt
        counts.append(cand.sum())

        # scatter-free compaction + write-back (ops/compaction.py): the
        # measured TPU cost of flatnonzero+scatter at 257^3 is ~470ms;
        # batched-cumsum select + rank gather is ~4x cheaper and fuses
        if self.select == "uncertain":
            # two-tier priority (Seg3dTopk-style): most-uncertain voxels
            # survive budget overflow
            close = jnp.abs(occ_up - self.balance_value) < (
                self.boundary_tau * 0.5)
            hi = cand & close
            lo = cand & ~close
            idx_hi, rank_hi, total_hi = select_k(hi, budget)
            idx_lo, rank_lo, _ = select_k(lo, budget)
            ks = jnp.arange(budget)
            take_lo = ks >= total_hi
            idx = jnp.where(take_lo,
                            idx_lo[jnp.clip(ks - total_hi, 0, budget - 1)],
                            idx_hi)
            rank = jnp.where(hi, rank_hi, rank_lo + total_hi)
        else:
            idx, rank, _ = select_k(cand, budget)
        n_vox = res ** 3
        safe = jnp.where(idx < n_vox, idx, 0)
        # flat index -> (i=z, j=y, k=x) -> world
        iz = safe // (res * res)
        jy = (safe // res) % res
        kx = safe % res
        pts = index_to_world(jnp.stack([kx, jy, iz], axis=-1), res,
                             self.b_min, self.b_max)
        preds = query_fn(pts[None])[0, :, 0]
        preds = jnp.where(idx < n_vox, preds, self.balance_value)
        occ = rank_writeback(occ_up, cand, rank, preds)
        return occ

    # -- reference-parity helper -------------------------------------------
    def dense(self, query_fn: QueryFn, resolution: int | None = None,
              chunk: int = 262144) -> jax.Array:
        """Exhaustive evaluation at the final resolution (oracle path)."""
        resolution = resolution or self.resolutions[-1]
        return dense_eval(query_fn, resolution, self.b_min, self.b_max,
                          chunk=chunk)
