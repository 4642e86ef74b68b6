"""Golden-model parity: converted torch weights must reproduce reference
outputs (the bit-closeness oracle of SURVEY §7 step 2 / BASELINE.json).

Random-initialized reference torch modules are converted with
monoport_tpu.convert and evaluated on identical inputs; small spatial sizes
keep this tractable on 1 CPU core while exercising every layer type.
"""

from types import SimpleNamespace

import numpy as np
import torch

import jax
import jax.numpy as jnp

from monoport_tpu.config import CN
from monoport_tpu.convert import (convert_backbone_state, convert_head_state,
                                  convert_monoport_state)
from monoport_tpu.models import MonoPortNet
from monoport_tpu.models.backbones import PIFuHGFilters, PIFuResBlkFilters
from monoport_tpu.models.heads import PIFuNetGMLP

RNG = np.random.RandomState(7)

HG_OPT = dict(num_stack=2, num_hourglass=2, hourglass_dim=256,
              norm="group", hg_down="ave_pool")


def _torch_hg(ref):
    from monoport.lib.modeling.backbones.HGFilters import HGFilter
    opt = SimpleNamespace(num_stack=HG_OPT["num_stack"],
                          num_hourglass=HG_OPT["num_hourglass"],
                          hourglass_dim=HG_OPT["hourglass_dim"],
                          norm=HG_OPT["norm"], hg_down=HG_OPT["hg_down"],
                          skip_hourglass=False)
    net = HGFilter(opt)
    net.eval()
    return net


def test_hgfilter_golden(ref):
    tnet = _torch_hg(ref)
    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = [o[0].numpy() for o in tnet(torch.from_numpy(x))]

    params = convert_backbone_state(tnet.state_dict(), "PIFuHGFilters")
    jnet = PIFuHGFilters(CN(HG_OPT))
    got = jnet.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    assert len(got) == len(want)
    for g, w in zip(got, want):
        g = np.asarray(g[0]).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(g, w, atol=2e-4, rtol=1e-3)


def test_resnetfilter_golden(ref):
    from monoport.lib.modeling.backbones.ResBlkFilters import (
        ResnetFilter, get_norm_layer)
    topt = SimpleNamespace(use_tanh=False)
    tnet = ResnetFilter(topt, norm_layer=get_norm_layer("group"))
    tnet.eval()
    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x))[0][0].numpy()

    params = convert_backbone_state(tnet.state_dict(), "PIFuResBlkFilters")
    jnet = PIFuResBlkFilters(CN({"use_tanh": False}))
    got = jnet.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 3, 1)))
    g = np.asarray(got[0][0]).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(g, want, atol=2e-4, rtol=1e-3)


def test_surface_classifier_golden(ref):
    from monoport.lib.modeling.heads.SurfaceClassifier import PIFuNetGMLP as TorchG
    tnet = TorchG()
    tnet.eval()
    x = RNG.randn(1, 257, 211).astype(np.float32)
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()  # [1, 1, N]

    params = convert_head_state(tnet.state_dict())
    jnet = PIFuNetGMLP()
    got = jnet.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 1)))  # [1, N, 1]
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=1e-5, rtol=1e-4)


def test_legacy_pifu_key_remap(ref):
    """surface_classifier.convN.* -> filters_N (MonoPortNet.py:153-160)."""
    from monoport.lib.modeling.heads.SurfaceClassifier import PIFuNetGMLP as TorchG
    tnet = TorchG()
    legacy = {}
    for k, v in tnet.state_dict().items():
        n = k.split(".")[1]
        legacy[f"surface_classifier.conv{n}.{k.split('.')[2]}"] = v
    tree = convert_monoport_state(legacy, "PIFuHGFilters", legacy_pifu=True)
    head = tree["params"]["surface_classifier"]
    assert set(head) == {f"filters_{i}" for i in range(5)}
    np.testing.assert_array_equal(
        head["filters_0"]["kernel"],
        tnet.state_dict()["filters.0.weight"].numpy()[..., 0].T)


def _query_torch(ref, tnet_filter, thead, x, pts, calib):
    """Reference query path composed from reference ops (MonoPortNet.py:48-91)."""
    from monoport.lib.modeling.geometry import index as t_index
    from monoport.lib.modeling.geometry import orthogonal as t_ortho
    with torch.no_grad():
        feats_stages = tnet_filter(x)
        xyz = t_ortho(pts, calib)
        xy = xyz[:, :2, :]
        z = xyz[:, 2:3, :]
        in_img = ((xy[:, 0] >= -1) & (xy[:, 0] <= 1)
                  & (xy[:, 1] >= -1) & (xy[:, 1] <= 1))
        z_feat = z * (512 // 2 / 200.0)
        preds = []
        for feats in feats_stages:
            feat = torch.cat([t_index(f, xy) for f in feats] + [z_feat], 1)
            preds.append(in_img[:, None].float() * thead(feat))
    return [p.numpy() for p in preds]


def test_monoportnet_query_golden(ref):
    """End-to-end netG (small config): filter + query vs reference."""
    from monoport.lib.modeling.heads.SurfaceClassifier import SurfaceClassifier
    tfilter = _torch_hg(ref)
    thead = SurfaceClassifier([257, 64, 32, 1], 1, no_residual=False,
                              last_op=torch.nn.Sigmoid())
    thead.eval()

    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    pts = RNG.uniform(-1, 1, size=(1, 3, 97)).astype(np.float32) * 1.1
    calib = np.eye(4, dtype=np.float32)[None][:, :4, :4]
    calib[:, :3, :3] *= 0.9

    want = _query_torch(ref, tfilter, thead,
                        torch.from_numpy(x), torch.from_numpy(pts),
                        torch.from_numpy(calib))

    opt = CN()
    opt.projection = "orthogonal"
    opt.backbone = CN({"IMF": "PIFuHGFilters", **HG_OPT})
    opt.normalizer = CN({"IMF": "PIFuNomalizer", "soft_onehot": False,
                         "soft_dim": 64})
    opt.head = CN({"IMF": "PIFuNetGMLP_small"})
    opt.loss = CN({"IMF": "MSE"})

    # register the small head for this test
    from monoport_tpu.models.heads import HEADS
    from monoport_tpu.models.heads.surface_classifier import SurfaceClassifier as JSC
    HEADS["PIFuNetGMLP_small"] = lambda o=None, name=None: JSC(
        filter_channels=(257, 64, 32, 1), num_views=1, no_residual=False,
        last_op=jax.nn.sigmoid, name=name)

    net = MonoPortNet(opt)
    variables = {"params": {
        "image_filter": convert_backbone_state(
            tfilter.state_dict(), "PIFuHGFilters"),
        "surface_classifier": convert_head_state(thead.state_dict()),
    }}

    jx = jnp.asarray(x.transpose(0, 2, 3, 1))
    jpts = jnp.asarray(pts.transpose(0, 2, 1))
    jcalib = jnp.asarray(calib)

    # training mode: all stages supervised
    feats = net.apply(variables, jx, method="filter")
    got = net.apply(variables, feats, jpts, jcalib, train=True,
                    method="query")
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g).transpose(0, 2, 1), w,
                                   atol=5e-4, rtol=1e-3)
    # eval mode: last stage only (MonoPortNet.py:63-64)
    got_eval = net.apply(variables, feats, jpts, jcalib, train=False,
                         method="query")
    assert len(got_eval) == 1
    np.testing.assert_allclose(np.asarray(got_eval[0]).transpose(0, 2, 1),
                               want[-1], atol=5e-4, rtol=1e-3)


def test_load_legacy_pifu_file_roundtrip(ref, tmp_path):
    """Full file path: torch.save a legacy-keyed ckpt -> load_legacy_pifu
    -> same outputs as the torch modules (RTL/main.py:108-112 flow)."""
    import torch as _torch
    from monoport_tpu.convert import load_legacy_pifu
    from monoport_tpu.models.backbones import PIFuHGFilters
    from monoport.lib.modeling.heads.SurfaceClassifier import (
        PIFuNetGMLP as TorchHead)

    tfilter = _torch_hg(ref)
    thead = TorchHead()
    thead.eval()
    state = {}
    for k, v in tfilter.state_dict().items():
        state[f"image_filter.{k}"] = v
    for k, v in thead.state_dict().items():
        n, leaf = k.split(".")[1], k.split(".")[2]
        state[f"surface_classifier.conv{n}.{leaf}"] = v
    path = str(tmp_path / "net_G")
    _torch.save(state, path)

    variables = load_legacy_pifu(path, "PIFuHGFilters")
    jnet = PIFuHGFilters(CN(HG_OPT))
    x = RNG.randn(1, 3, 64, 64).astype(np.float32)
    got = jnet.apply({"params": variables["params"]["image_filter"]},
                     jnp.asarray(x.transpose(0, 2, 3, 1)))
    with torch.no_grad():
        want = tfilter(torch.from_numpy(x))[-1][0].numpy()
    np.testing.assert_allclose(
        np.asarray(got[-1][0]).transpose(0, 3, 1, 2), want,
        atol=2e-4, rtol=1e-3)


def test_multiview_head_pooling(ref):
    """num_views>1 mean-pool hook (SurfaceClassifier.py:60-66 parity)."""
    from monoport.lib.modeling.heads.SurfaceClassifier import (
        SurfaceClassifier as TorchSC)
    from monoport_tpu.models.heads.surface_classifier import (
        SurfaceClassifier as JaxSC)

    tnet = TorchSC([33, 16, 8, 1], num_views=2, no_residual=False,
                   last_op=torch.nn.Sigmoid())
    tnet.eval()
    x = RNG.randn(4, 33, 50).astype(np.float32)  # 2 groups x 2 views
    with torch.no_grad():
        want = tnet(torch.from_numpy(x)).numpy()

    params = convert_head_state(tnet.state_dict())
    jnet = JaxSC(filter_channels=(33, 16, 8, 1), num_views=2,
                 no_residual=False, last_op=jax.nn.sigmoid)
    got = jnet.apply({"params": params},
                     jnp.asarray(x.transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want,
                               atol=1e-5, rtol=1e-4)
