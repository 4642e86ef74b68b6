"""PyTorch checkpoint -> JAX param-pytree conversion.

Covers both checkpoint formats of the reference (SURVEY §5.4):
  * native Trainer dicts {opt, net, optimizer, scheduler, ...}
    (monoport/lib/common/trainer.py:61-75) — the ``net`` state dict uses
    ``image_filter.*`` / ``surface_classifier.filters.N.*`` keys;
  * legacy PIFu state dicts where the head keys are
    ``surface_classifier.convN.*`` (MonoPortNet.py:153-160).

Tensor layout transforms:
  * Conv2d weight [O, I, kh, kw]  -> HWIO [kh, kw, I, O];
  * Conv1d weight [O, I, 1]       -> Dense kernel [I, O];
  * norm weight/bias              -> scale/bias.

This module only needs numpy; torch is required just to unpickle .pth
files (torch is CPU-available in this image).
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np


def _to_numpy(t: Any) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    return t.detach().cpu().numpy()  # torch tensor


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    if path[-1] in node:
        raise ValueError(f"duplicate param path {path}")
    node[path[-1]] = value


def _leaf(parts: list[str], tensor: np.ndarray) -> tuple[tuple[str, ...], np.ndarray] | None:
    """Map a torch (module-path, tensor) to a flax (path, array) leaf."""
    leaf = parts[-1]
    mods = parts[:-1]
    if leaf == "weight":
        if tensor.ndim == 4:      # Conv2d OIHW -> HWIO
            return tuple(mods) + ("kernel",), tensor.transpose(2, 3, 1, 0)
        if tensor.ndim == 3:      # Conv1d (k=1) -> Dense [I, O]
            return tuple(mods) + ("kernel",), tensor[..., 0].T
        if tensor.ndim == 2:      # Linear -> Dense [I, O]
            return tuple(mods) + ("kernel",), tensor.T
        if tensor.ndim == 1:      # norm scale
            return tuple(mods) + ("scale",), tensor
        raise ValueError(f"unhandled weight ndim {tensor.ndim} at {parts}")
    if leaf == "bias":
        return tuple(mods) + ("bias",), tensor
    if leaf in ("running_mean", "running_var", "num_batches_tracked"):
        return None  # batch-stats: PIFu configs use GroupNorm (none present)
    raise ValueError(f"unhandled leaf {leaf} at {parts}")


def _map_hg_parts(parts: list[str]) -> list[str] | None:
    """HGFilter key fixups: shared bn4 / downsample Sequential naming."""
    if "downsample" in parts:
        i = parts.index("downsample")
        if parts[i + 1] == "0":
            return None  # duplicate of the shared bn4 (HGFilters.py:30-36)
        assert parts[i + 1] == "2", parts
        return parts[:i] + ["downsample_conv"] + parts[i + 2:]
    return parts


_RESNET_STEM = {
    "1": ["conv_stem"], "2": ["norm_stem"],
    "4": ["down0_conv"], "5": ["down0_norm"],
    "7": ["down1_conv"], "8": ["down1_norm"],
}
_RESNET_BLOCK_INNER = {"1": "conv1", "2": "norm1", "5": "conv2", "6": "norm2"}


def _map_resnet_parts(parts: list[str]) -> list[str] | None:
    """ResnetFilter: flatten torch nn.Sequential indices to semantic names
    (layout per ResBlkFilters.py:111-134 with group norm / no bias)."""
    assert parts[0] == "model", parts
    idx = parts[1]
    if idx in _RESNET_STEM:
        return _RESNET_STEM[idx] + parts[2:]
    block = int(idx) - 10
    assert 0 <= block < 6 and parts[2] == "conv_block", parts
    return [f"block{block}", _RESNET_BLOCK_INNER[parts[3]]] + parts[4:]


_BACKBONE_MAPPERS = {
    "PIFuHGFilters": _map_hg_parts,
    "PIFuResBlkFilters": _map_resnet_parts,
}


def convert_backbone_state(state: Mapping[str, Any], imf: str) -> dict:
    """Convert a backbone state dict to a flax param subtree."""
    mapper = _BACKBONE_MAPPERS[imf]
    tree: dict = {}
    for key, tensor in state.items():
        parts = mapper(key.split("."))
        if parts is None:
            continue
        mapped = _leaf(parts, _to_numpy(tensor))
        if mapped is not None:
            _set(tree, *mapped)
    return tree


def convert_head_state(state: Mapping[str, Any]) -> dict:
    """Convert a SurfaceClassifier state dict (``filters.N.*`` keys)."""
    tree: dict = {}
    for key, tensor in state.items():
        parts = key.split(".")
        assert parts[0] == "filters", key
        mapped = _leaf([f"filters_{parts[1]}", parts[2]], _to_numpy(tensor))
        if mapped is not None:
            _set(tree, *mapped)
    return tree


def convert_monoport_state(state: Mapping[str, Any], backbone_imf: str,
                           legacy_pifu: bool = False) -> dict:
    """Convert a full MonoPortNet state dict -> {'params': ...} variables.

    legacy_pifu remaps ``surface_classifier.convN`` -> ``filters.N``
    (MonoPortNet.py:153-160).
    """
    backbone_state, head_state = {}, {}
    for key, tensor in state.items():
        if key.startswith("image_filter."):
            backbone_state[key[len("image_filter."):]] = tensor
        elif key.startswith("surface_classifier."):
            sub = key[len("surface_classifier."):]
            if legacy_pifu:
                m = re.match(r"conv(\d+)\.(.*)", sub)
                assert m, key
                sub = f"filters.{m.group(1)}.{m.group(2)}"
            head_state[sub] = tensor
        else:
            raise ValueError(f"unexpected key {key}")
    return {"params": {
        "image_filter": convert_backbone_state(backbone_state, backbone_imf),
        "surface_classifier": convert_head_state(head_state),
    }}


def load_legacy_pifu(ckpt_path: str, backbone_imf: str) -> dict:
    """Load a legacy PIFu .pth checkpoint into flax variables."""
    import torch

    state = torch.load(ckpt_path, map_location="cpu")
    if isinstance(state, dict) and "net" in state:  # Trainer-format dict
        return convert_monoport_state(state["net"], backbone_imf,
                                      legacy_pifu=False)
    return convert_monoport_state(state, backbone_imf, legacy_pifu=True)
