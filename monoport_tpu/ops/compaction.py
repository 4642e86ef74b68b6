"""Static-shape stream compaction without scatters.

TPU reality check (measured on v5e through this stack): at 17M elements a
flat cumsum costs ~270ms, a 262k-element scalar scatter ~150ms, and
jnp.flatnonzero (cumsum+scatter) ~320ms — all serialization-bound, while
MXU GEMMs run at 80+ TFLOP/s. The hierarchical evaluator needs exactly
one primitive: "give me the first K true positions of a boolean volume,
and later write values back at those positions". This module implements it
with only *batched* cumsums (rows scanned in parallel across sublanes),
small binary searches (a handful of gather rounds), and one dense gather —
no scatter instructions at all:

  * ``batched_cumsum``  — inclusive prefix sum via [rows, L] row scans +
    a small recursive scan over row totals (~7x faster than flat);
  * ``select_k``        — indices of the first K true elements: row-wise
    cumsum + binary search over row offsets (17 gather rounds) + an
    8-round in-row binary search;
  * ``rank_writeback``  — dense write-back of per-rank values using the
    rank field (cumsum - 1) and a gather from the small value table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def batched_cumsum(x: jax.Array, row_len: int = 2048) -> jax.Array:
    """Inclusive prefix sum of a flat int32 array, TPU-friendly."""
    n = x.shape[0]
    if n <= row_len:
        return jnp.cumsum(x)
    pad = _round_up(n, row_len) - n
    rows = jnp.pad(x, (0, pad)).reshape(-1, row_len)
    within = jnp.cumsum(rows, axis=1)
    totals = within[:, -1]
    offsets = batched_cumsum(totals, row_len) - totals  # exclusive
    return (within + offsets[:, None]).reshape(-1)[:n]


def _searchsorted_right(cum: jax.Array, queries: jax.Array,
                        length: int) -> jax.Array:
    """First index i with cum[i] > q (cum nondecreasing), manual binary
    search: log2(length) gather rounds, vectorized over queries. Rounds
    run in a device-side fori_loop — unrolling them bloats the program
    enough to crash the TPU backend's register allocator on big graphs."""
    steps = max(1, (length - 1).bit_length())

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) // 2
        go_right = cum[jnp.clip(mid, 0, length - 1)] <= queries
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
        return lo, hi

    lo, _ = jax.lax.fori_loop(
        0, steps, body,
        (jnp.zeros_like(queries), jnp.full_like(queries, length)))
    return lo


def select_k(mask: jax.Array, budget: int):
    """First-K true positions of a boolean array (any shape).

    Returns (idx [budget] int32 — flat positions, sorted, == n for padding
    lanes; rank [mask.shape] int32 — 0-based rank of each true element;
    total [] int32 — number of true elements).
    """
    shape = mask.shape
    flat = mask.reshape(-1).astype(jnp.int32)
    n = flat.shape[0]
    cum = batched_cumsum(flat)                      # inclusive
    total = cum[-1]
    # idx of the k-th (0-based) true element: first i with cum[i] > k
    ks = jnp.arange(budget, dtype=jnp.int32)
    idx = _searchsorted_right(cum, ks, n)
    idx = jnp.where(ks < total, idx, n).astype(jnp.int32)
    rank = (cum - flat).reshape(shape)              # exclusive prefix = rank
    return idx, rank, total


def rank_writeback(base: jax.Array, mask: jax.Array, rank: jax.Array,
                   values: jax.Array) -> jax.Array:
    """base[i] <- values[rank[i]] where mask[i] and rank[i] < len(values).

    One clipped gather from the small ``values`` table; no scatter.
    """
    budget = values.shape[0]
    safe = jnp.clip(rank, 0, budget - 1)
    gathered = values[safe]
    take = mask & (rank < budget)
    return jnp.where(take, gathered.astype(base.dtype), base)


def dilate_mask(mask: jax.Array, times: int = 1) -> jax.Array:
    """Separable 3x3x3 boolean dilation via shift-ors (no reduce_window:
    measured ~1.6x faster and fuses into neighbouring elementwise ops)."""

    def shift(x, ax, d):
        pads = [(0, 0)] * x.ndim
        pads[ax] = (max(d, 0), max(-d, 0))
        xp = jnp.pad(x, pads)
        sl = [slice(None)] * x.ndim
        sl[ax] = slice(max(-d, 0), xp.shape[ax] - max(d, 0))
        return xp[tuple(sl)]

    for _ in range(times):
        for ax in range(mask.ndim):
            mask = mask | shift(mask, ax, 1) | shift(mask, ax, -1)
    return mask
