"""Profiling utilities (SURVEY §5.1 — the reference has only tqdm).

``device_time`` implements the only timing method that is reliable on a
tunneled TPU backend (block_until_ready may not block; un-jitted host
dispatches are expensive): run K iterations on-device inside one
lax.fori_loop, chained by a data dependency, fetch one scalar, subtract
the measured fetch RTT.

``trace`` wraps jax.profiler for TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp


def measure_rtt(samples: int = 3) -> float:
    """Host<->device round-trip of a tiny fetch."""
    x = jnp.ones((8, 8))
    _ = np.asarray((x * 2.0).sum())
    t0 = time.perf_counter()
    for i in range(samples):
        _ = np.asarray((x * float(i + 2)).sum())
    return (time.perf_counter() - t0) / samples


def device_time(fn: Callable, arg, chain: Callable | None = None,
                iters: int = 20, rtt: float | None = None) -> float:
    """Seconds per call of ``fn(arg)``, measured on-device.

    ``chain(arg, out) -> arg`` must make iteration i+1 depend on i's
    output (default: add a tiny function of the output's first leaf).
    """
    if chain is None:
        def chain(a, o):
            leaf = jax.tree.leaves(o)[0]
            return a + (leaf.astype(jnp.float32).sum() * 1e-12).astype(
                a.dtype)

    @jax.jit
    def loop(a):
        def body(_, a):
            return chain(a, fn(a))
        return jax.lax.fori_loop(0, iters, body, a)

    out = loop(arg)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]   # compile+settle
    rtt = measure_rtt() if rtt is None else rtt
    t0 = time.perf_counter()
    out = loop(arg)
    _ = np.asarray(jax.tree.leaves(out)[0]).ravel()[0]
    return max((time.perf_counter() - t0 - rtt) / iters, 0.0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace context (view in TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
