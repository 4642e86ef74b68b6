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


def _map_block_inner(rest: list[str]) -> list[str]:
    """Basic/Bottleneck inner names; torch downsample Sequential ->
    down_conv / down_bn (models/backbones/hrnet.py naming)."""
    if rest[0] == "downsample":
        return [{"0": "down_conv", "1": "down_bn"}[rest[1]]] + rest[2:]
    return rest


def _map_hrnet_parts(parts: list[str]) -> list[str] | None:
    """HRNet torch keys -> flax module paths (HRNetFilters.py:222-439 vs
    models/backbones/hrnet.py)."""
    p0 = parts[0]
    if p0 in ("conv1", "bn1", "conv2", "bn2"):
        return parts
    if p0 == "layer1":                       # layer1.{k}.<block-inner>
        return [f"layer1_{parts[1]}"] + _map_block_inner(parts[2:])
    if p0.startswith("transition"):
        si = int(p0[len("transition"):]) + 1  # transitionN feeds stage N+1
        i = parts[1]
        # existing branch: Sequential(conv, bn, relu) -> idx at parts[2];
        # new branch: Sequential(Sequential(conv, bn, relu)) -> parts[2]
        # is the (always single here) inner index, idx at parts[3]
        idx = parts[2] if len(parts) == 4 else parts[3]
        return [f"t{si}_{i}_" + {"0": "conv", "1": "bn"}[idx], parts[-1]]
    if p0.startswith("stage"):               # stage{si}.{m}....
        mod = f"stage{p0[len('stage'):]}_m{parts[1]}"
        if parts[2] == "branches":           # branches.{i}.{k}.<inner>
            return [mod, f"branch{parts[3]}_block{parts[4]}"] \
                + _map_block_inner(parts[5:])
        assert parts[2] == "fuse_layers", parts
        i, j = parts[3], parts[4]
        if int(j) > int(i):                  # Sequential(conv, bn, up)
            nm = {"0": f"fuse{i}_{j}_conv", "1": f"fuse{i}_{j}_bn"}[parts[5]]
            return [mod, nm, parts[-1]]
        k, idx = parts[5], parts[6]          # Sequential of Sequentials
        nm = {"0": f"fuse{i}_{j}_conv{k}", "1": f"fuse{i}_{j}_bn{k}"}[idx]
        return [mod, nm, parts[-1]]
    if p0 == "last_layer":                   # Sequential(conv, bn, relu, conv)
        nm = {"0": "last_conv1", "1": "last_bn", "3": "last_conv2"}[parts[1]]
        return [nm, parts[-1]]
    raise ValueError(f"unhandled HRNet key {parts}")


def _map_yolo_parts(parts: list[str]) -> list[str] | None:
    """Yolov4 torch keys -> flax paths (Yolov4Filters.py:91-378 vs
    models/backbones/yolov4.py). Conv_Bn_Activation is a ModuleList
    named 'conv' with conv at 0 and optional bn at 1."""
    top = parts[0]                           # down1..down5 | neek | head
    if parts[1] == "resblock":               # resblock.module_list.{i}.{j}.conv.{idx}
        i, j, idx = parts[3], parts[4], parts[6]
        return [top, "res", f"b{i}_conv{int(j) + 1}",
                {"0": "conv", "1": "bn"}[idx], parts[-1]]
    convk, idx = parts[1], parts[3]          # conv{k}.conv.{idx}.param
    return [top, convk, {"0": "conv", "1": "bn"}[idx], parts[-1]]


_BACKBONE_MAPPERS = {
    "PIFuHGFilters": _map_hg_parts,
    "PIFuResBlkFilters": _map_resnet_parts,
    "HRNetV2_W18_small_v2": _map_hrnet_parts,
    "HRNetV2_W18_small_v2_balance": _map_hrnet_parts,
    "HRNetV2_W18_small_v2_balance_gn32": _map_hrnet_parts,
    "HRNetV2_W18_small_v2_balance_last": _map_hrnet_parts,
    "HRNetV2_W18_small_v2_balance_v2": _map_hrnet_parts,
    "HRNetV2_W18_small_v2_deeper": _map_hrnet_parts,
    "Yolov4Filters": _map_yolo_parts,
}


def convert_backbone_state(state: Mapping[str, Any], imf: str,
                           with_stats: bool = False):
    """Convert a backbone state dict to a flax param subtree.

    with_stats=True additionally returns the BatchNorm running-stats
    subtree ({module: {mean, var}}, the flax 'batch_stats' collection) —
    HRNet/Yolov4 reference configs use BatchNorm (HRNetFilters.py:10)."""
    mapper = _BACKBONE_MAPPERS[imf]
    tree: dict = {}
    stats: dict = {}
    for key, tensor in state.items():
        parts = mapper(key.split("."))
        if parts is None:
            continue
        leaf = parts[-1]
        if leaf == "num_batches_tracked":
            continue
        if leaf in ("running_mean", "running_var"):
            name = "mean" if leaf == "running_mean" else "var"
            _set(stats, tuple(parts[:-1]) + (name,), _to_numpy(tensor))
            continue
        mapped = _leaf(parts, _to_numpy(tensor))
        if mapped is not None:
            _set(tree, *mapped)
    return (tree, stats) if with_stats else tree


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
    bb_params, bb_stats = convert_backbone_state(backbone_state,
                                                 backbone_imf,
                                                 with_stats=True)
    variables = {"params": {
        "image_filter": bb_params,
        "surface_classifier": convert_head_state(head_state),
    }}
    if bb_stats:
        variables["batch_stats"] = {"image_filter": bb_stats}
    return variables


def _yolo_conv137_key_order() -> list[str]:
    """Torch state-dict key order of Sequential(down1..down5, neek) —
    the zip target of the reference's yolov4.conv.137 loader
    (Yolov4Filters.py:392-401). Registration order of the reference
    modules (Yolov4Filters.py:91-313), reproduced here so the loader
    needs no torch model construction."""
    keys: list[str] = []

    def cba(prefix: str) -> None:
        keys.extend([
            f"{prefix}.conv.0.weight",
            f"{prefix}.conv.1.weight", f"{prefix}.conv.1.bias",
            f"{prefix}.conv.1.running_mean", f"{prefix}.conv.1.running_var",
            f"{prefix}.conv.1.num_batches_tracked"])

    for k in range(1, 9):
        cba(f"down1.conv{k}")
    for d, nblocks in (("down2", 2), ("down3", 8), ("down4", 8),
                       ("down5", 4)):
        for k in (1, 2, 3):
            cba(f"{d}.conv{k}")
        for i in range(nblocks):
            cba(f"{d}.resblock.module_list.{i}.0")
            cba(f"{d}.resblock.module_list.{i}.1")
        for k in (4, 5):
            cba(f"{d}.conv{k}")
    for k in range(1, 21):
        cba(f"neek.conv{k}")
    return keys


def load_darknet_conv137(ckpt_path: str):
    """Load ``yolov4.conv.137.pth`` by positional zip (Yolov4Filters.py:
    392-401: the file's own key names are IGNORED; tensors are assigned to
    the backbone+neck modules in registration order).

    Returns (params, batch_stats) flax subtrees covering down1..down5 +
    neek; the 3-scale head keeps its random init (the reference file has
    no head weights — 'conv137' is the darknet backbone cut)."""
    import torch

    pretrained = torch.load(ckpt_path, map_location="cpu")
    targets = _yolo_conv137_key_order()
    vals = list(pretrained.values())
    if len(vals) != len(targets):
        # files exported without num_batches_tracked counters
        no_nbt = [k for k in targets
                  if not k.endswith("num_batches_tracked")]
        targets = no_nbt if len(vals) == len(no_nbt) else targets
    state = dict(zip(targets, vals))  # zip truncates like the reference
    return convert_backbone_state(state, "Yolov4Filters", with_stats=True)


def merge_backbone_pretrained(variables: dict, params: dict,
                              stats: dict) -> dict:
    """Overlay converted backbone subtrees onto initialized net variables
    (partial load: modules absent from ``params`` keep their init, like
    the reference's model_dict.update)."""
    import copy

    def overlay(dst, src):
        for k, v in src.items():
            if isinstance(v, dict):
                overlay(dst.setdefault(k, {}), v)
            else:
                dst[k] = v

    out = copy.deepcopy(jax_tree_to_dict(variables))
    overlay(out.setdefault("params", {}).setdefault("image_filter", {}),
            params)
    if stats:
        overlay(out.setdefault("batch_stats", {}).setdefault(
            "image_filter", {}), stats)
    return out


def jax_tree_to_dict(tree):
    """FrozenDict/odict pytree -> plain nested dict (leaves unchanged)."""
    if hasattr(tree, "items"):
        return {k: jax_tree_to_dict(v) for k, v in tree.items()}
    return tree


def load_legacy_pifu(ckpt_path: str, backbone_imf: str) -> dict:
    """Load a legacy PIFu .pth checkpoint into flax variables."""
    import torch

    state = torch.load(ckpt_path, map_location="cpu")
    if isinstance(state, dict) and "net" in state:  # Trainer-format dict
        return convert_monoport_state(state["net"], backbone_imf,
                                      legacy_pifu=False)
    return convert_monoport_state(state, backbone_imf, legacy_pifu=True)
