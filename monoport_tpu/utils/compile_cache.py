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

def _default_dir() -> str:
    """Repo-checkout .jax_cache when the package's parent is writable
    (the development/bench layout); otherwise a user cache dir — a pip
    site-packages install must not try to write next to the interpreter
    (it would silently never persist)."""
    repo_parent = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    candidate = os.path.join(repo_parent, ".jax_cache")
    if os.path.isdir(candidate) or os.access(repo_parent, os.W_OK):
        return candidate
    return os.path.join(os.path.expanduser("~"), ".cache", "monoport_tpu",
                        "jax_cache")


DEFAULT_DIR = _default_dir()


def enable(cache_dir: str | None = None) -> None:
    """Turn on the persistent compilation cache (best-effort). Priority:
    explicit arg > $JAX_COMPILATION_CACHE_DIR > DEFAULT_DIR."""
    try:
        jax.config.update("jax_compilation_cache_dir",
                          cache_dir or os.environ.get(
                              "JAX_COMPILATION_CACHE_DIR", DEFAULT_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass
