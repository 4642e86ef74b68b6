"""Scatter-free compaction primitives vs numpy oracles."""

import numpy as np

import jax.numpy as jnp

from monoport_tpu.ops.compaction import (batched_cumsum, dilate_mask,
                                         rank_writeback, select_k)

RNG = np.random.RandomState(0)


def test_batched_cumsum_matches_numpy():
    for n in (5, 2048, 2049, 100000):
        x = RNG.randint(0, 3, n).astype(np.int32)
        got = np.asarray(batched_cumsum(jnp.asarray(x), row_len=128))
        np.testing.assert_array_equal(got, np.cumsum(x))


def test_select_k_matches_flatnonzero():
    mask = RNG.rand(17, 19, 23) < 0.1
    budget = 256
    idx, rank, total = select_k(jnp.asarray(mask), budget)
    want = np.flatnonzero(mask)
    assert int(total) == len(want)
    got = np.asarray(idx)
    np.testing.assert_array_equal(got[:len(want)], want[:budget])
    assert (got[len(want):] == mask.size).all()
    # rank field: exclusive prefix count
    np.testing.assert_array_equal(
        np.asarray(rank).reshape(-1)[want], np.arange(len(want)))


def test_select_k_budget_overflow():
    mask = np.ones(100, bool)
    idx, rank, total = select_k(jnp.asarray(mask), 10)
    np.testing.assert_array_equal(np.asarray(idx), np.arange(10))
    assert int(total) == 100


def test_rank_writeback():
    mask = RNG.rand(1000) < 0.3
    base = RNG.randn(1000).astype(np.float32)
    n_true = mask.sum()
    values = RNG.randn(n_true).astype(np.float32)
    _, rank, _ = select_k(jnp.asarray(mask), n_true)
    got = np.asarray(rank_writeback(jnp.asarray(base), jnp.asarray(mask),
                                    rank, jnp.asarray(values)))
    want = base.copy()
    want[mask] = values
    np.testing.assert_allclose(got, want)


def test_dilate_matches_reduce_window():
    import jax
    mask = jnp.asarray(RNG.rand(9, 10, 11) < 0.05)
    got = np.asarray(dilate_mask(mask, 2))
    m = mask.astype(jnp.float32)
    for _ in range(2):
        m = jax.lax.reduce_window(m, -jnp.inf, jax.lax.max,
                                  (3, 3, 3), (1, 1, 1), "SAME")
    np.testing.assert_array_equal(got, np.asarray(m > 0.5))
