"""Golden parity for the alternative backbones (HRNet, Yolov4) including
BatchNorm running-stats conversion and the darknet positional-zip loader.

Round 1 shipped these encoders with shape-contract tests only; these pin
numerical parity against the reference torch modules (random init with
randomized running stats, eval mode)."""

from types import SimpleNamespace

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from monoport_tpu.config import CN
from monoport_tpu.convert import (convert_backbone_state,
                                  load_darknet_conv137,
                                  merge_backbone_pretrained)
from monoport_tpu.models.backbones import BACKBONES

RNG = np.random.RandomState(11)


def _randomize_bn_stats(tnet, rng):
    """Non-trivial running stats so eval-mode BN conversion is actually
    tested (fresh torch BN has mean=0, var=1 — a silent-drop converter
    would still pass)."""
    for m in tnet.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.from_numpy(
                rng.randn(m.num_features).astype(np.float32) * 0.3))
            m.running_var.copy_(torch.from_numpy(
                rng.rand(m.num_features).astype(np.float32) * 1.5 + 0.3))


@pytest.mark.parametrize("factory", [
    "HRNetV2_W18_small_v2",
    "HRNetV2_W18_small_v2_balance_last",
])
def test_hrnet_golden(ref, factory):
    import monoport.lib.modeling.backbones.HRNetFilters as H

    tnet = getattr(H, factory)(SimpleNamespace())
    tnet.eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet, RNG)
    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tnet(torch.from_numpy(x))[0]]

    params, stats = convert_backbone_state(tnet.state_dict(), factory,
                                           with_stats=True)
    jnet = BACKBONES[factory](CN({"norm": "batch"}))
    got = jnet.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))[0]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        g = np.asarray(g).transpose(0, 3, 1, 2)
        # random init + random running stats -> unnormalized activations
        # with huge dynamic range; bound the error relative to the peak
        # (2e-4 of max, the HG golden tolerance scaled to magnitude)
        np.testing.assert_allclose(g, w, rtol=1e-3,
                                   atol=2e-4 * max(np.abs(w).max(), 1.0))


@pytest.fixture(scope="module")
def torch_yolo(ref):
    from monoport.lib.modeling.backbones.Yolov4Filters import Yolov4

    tnet = Yolov4(yolov4conv137weight=None, output_ch=256, inference=True)
    tnet.eval()
    with torch.no_grad():
        _randomize_bn_stats(tnet, RNG)
    return tnet


def test_yolov4_golden(ref, torch_yolo):
    tnet = torch_yolo
    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [t[0].numpy() for t in tnet(torch.from_numpy(x))]

    params, stats = convert_backbone_state(tnet.state_dict(),
                                           "Yolov4Filters", with_stats=True)
    jnet = BACKBONES["Yolov4Filters"](CN({"norm": "batch"}))
    got = jnet.apply({"params": params, "batch_stats": stats},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        g = np.asarray(g[0]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, w, rtol=1e-3,
                                   atol=3e-4 * max(np.abs(w).max(), 1.0))


def test_darknet_conv137_positional_zip(ref, torch_yolo, tmp_path):
    """The conv137 loader must reproduce the reference's zip semantics:
    tensor VALUES are taken in file order, file KEY NAMES are ignored
    (Yolov4Filters.py:392-401). Saved here with scrambled key names."""
    tnet = torch_yolo
    seq = torch.nn.Sequential(tnet.down1, tnet.down2, tnet.down3,
                              tnet.down4, tnet.down5, tnet.neek)
    sd = seq.state_dict()
    scrambled = {f"darknet.blob_{i}": v for i, v in enumerate(sd.values())}
    path = tmp_path / "yolov4.conv.137.pth"
    torch.save(scrambled, path)

    params, stats = load_darknet_conv137(str(path))

    # must equal the name-based conversion of the full net, minus the head
    params_ref, stats_ref = convert_backbone_state(
        tnet.state_dict(), "Yolov4Filters", with_stats=True)
    params_ref.pop("head")
    stats_ref.pop("head")

    import jax
    assert jax.tree.structure(params) == jax.tree.structure(params_ref)
    assert jax.tree.structure(stats) == jax.tree.structure(stats_ref)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(params_ref)):
        np.testing.assert_array_equal(a, b)
    for a, b in zip(jax.tree.leaves(stats), jax.tree.leaves(stats_ref)):
        np.testing.assert_array_equal(a, b)

    # and a merged net must match torch end-to-end (head converted too,
    # since random heads can't match; overlay proves partial-load works)
    jnet = BACKBONES["Yolov4Filters"](CN({"norm": "batch"}))
    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    full_p, full_s = convert_backbone_state(
        tnet.state_dict(), "Yolov4Filters", with_stats=True)
    merged = merge_backbone_pretrained(
        {"params": {"image_filter": {"head": full_p["head"]}},
         "batch_stats": {"image_filter": {"head": full_s["head"]}}},
        params, stats)
    got = jnet.apply(
        {"params": merged["params"]["image_filter"],
         "batch_stats": merged["batch_stats"]["image_filter"]},
        jnp.asarray(x.transpose(0, 2, 3, 1)))
    with torch.no_grad():
        want = [t[0].numpy() for t in tnet(torch.from_numpy(x))]
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g[0]).transpose(0, 3, 1, 2), w,
            atol=3e-4, rtol=1e-3)
