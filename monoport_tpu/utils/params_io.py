"""Flat-npz parameter checkpoints for committed in-repo weights.

orbax handles training checkpoints (training/trainer.py); this format is
for SMALL weights shipped inside the package (f16 on disk, loads without
orbax/torch in milliseconds). Paths are '/'-joined pytree keys."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_params(path: str, params, meta: dict | None = None) -> None:
    """Save a param pytree (+ scalar int metadata) as compressed f16 npz."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {}
    for key, value in (meta or {}).items():
        # the sentinel is exactly two underscores each side; edge
        # underscores in the key itself would collide on load
        assert not (key.startswith("_") or key.endswith("_")), key
        arrays[f"__{key}__"] = np.asarray(value, np.int32)
    for kpath, leaf in flat:
        name = "/".join(p.key for p in kpath)
        leaf = np.asarray(leaf)
        # f16 on disk is only lossless-enough for float weights; an int
        # leaf (step counters, BN counts) would be silently corrupted
        assert np.issubdtype(leaf.dtype, np.floating), (name, leaf.dtype)
        arrays[name] = leaf.astype(np.float16)
    np.savez_compressed(path, **arrays)


def load_params(path: str):
    """-> (params pytree (f32), meta dict) from save_params output."""
    data = np.load(path)
    meta: dict = {}
    params: dict = {}
    for name in data.files:
        if name.startswith("__") and name.endswith("__"):
            meta[name[2:-2]] = int(data[name])
            continue
        node = params
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[name], jnp.float32)
    return params, meta
