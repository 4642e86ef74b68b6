"""Persistent XLA compilation cache (opt-in per entry point).

Through this environment's remote-compile relay a big program costs 3-10
minutes to compile (DESIGN.md); the persistent cache makes re-runs of
bench/train/demo entry points start in seconds. Verified to serialize and
reload executables on the tunneled TPU backend (round 2: a second bench
run skipped the ~1h compile).

Not enabled at import of the package itself: libraries should not mutate
global jax config; entry points (bench.py, apps/train_*, apps/rtl_main)
call ``enable()`` explicitly.
"""

from __future__ import annotations

import os

import jax

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(cache_dir: str | None = None) -> None:
    """Turn on the persistent compilation cache (best-effort)."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or os.environ.get(
                              "JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
