"""Primitive-op parity against torch (the reference's numerical substrate).

Each op that can silently break pretrained-weight parity (SURVEY §7 "hard
parts") gets a direct comparison: grid_sample corner conventions, bicubic
align-corners upsampling, nearest resize, avg-pool, projections, and the
depth normalizer's scatter semantics.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from monoport_tpu.ops import (avg_pool_2d, grid_sample_2d, index,
                              interpolate_2d, interpolate_3d, orthogonal,
                              perspective, upsample2x_bicubic)
from monoport_tpu.models.normalizers import DepthNormalizer

RNG = np.random.RandomState(0)


def test_grid_sample_align_corners_zero_pad():
    feat = RNG.randn(2, 17, 23, 8).astype(np.float32)   # NHWC
    # include out-of-range points to exercise zeros padding
    uv = RNG.uniform(-1.3, 1.3, size=(2, 501, 2)).astype(np.float32)

    got = np.asarray(grid_sample_2d(jnp.asarray(feat), jnp.asarray(uv)))

    tfeat = torch.from_numpy(feat.transpose(0, 3, 1, 2))  # NCHW
    tgrid = torch.from_numpy(uv).unsqueeze(2)              # [B, N, 1, 2]
    want = F.grid_sample(tfeat, tgrid, align_corners=True)[..., 0]
    want = want.permute(0, 2, 1).numpy()                   # [B, N, C]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_index_matches_reference_contract():
    feat = RNG.randn(1, 16, 16, 4).astype(np.float32)
    uv = RNG.uniform(-1, 1, size=(1, 64, 2)).astype(np.float32)
    got = np.asarray(index(jnp.asarray(feat), jnp.asarray(uv)))
    tfeat = torch.from_numpy(feat.transpose(0, 3, 1, 2))
    tgrid = torch.from_numpy(uv).unsqueeze(2)
    want = F.grid_sample(tfeat, tgrid, align_corners=True)[..., 0]
    np.testing.assert_allclose(got, want.permute(0, 2, 1).numpy(), atol=1e-5)


@pytest.mark.parametrize("size", [(8, 8), (13, 9)])
def test_bicubic_upsample2x(size):
    x = RNG.randn(2, *size, 5).astype(np.float32)
    got = np.asarray(upsample2x_bicubic(jnp.asarray(x)))
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         scale_factor=2, mode="bicubic", align_corners=True)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-4)


def test_nearest_resize():
    x = RNG.randn(1, 7, 11, 3).astype(np.float32)
    got = np.asarray(interpolate_2d(jnp.asarray(x), (128, 128), "nearest"))
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(128, 128))  # default nearest
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1))


def test_bilinear_resize():
    x = RNG.randn(1, 9, 9, 2).astype(np.float32)
    got = np.asarray(interpolate_2d(jnp.asarray(x), (17, 17), "bilinear",
                                    align_corners=True))
    want = F.interpolate(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         size=(17, 17), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-5, rtol=1e-5)


def test_trilinear_volume_upsample():
    vol = RNG.randn(9, 9, 9).astype(np.float32)
    got = np.asarray(interpolate_3d(jnp.asarray(vol), (17, 17, 17)))
    want = F.interpolate(torch.from_numpy(vol)[None, None],
                         size=(17, 17, 17), mode="trilinear",
                         align_corners=True)[0, 0]
    np.testing.assert_allclose(got, want.numpy(), atol=1e-5, rtol=1e-5)
    # exact nesting: coarse grid points are preserved under 2^k+1 levels
    np.testing.assert_allclose(got[::2, ::2, ::2], vol, atol=1e-6)


def test_avg_pool():
    x = RNG.randn(2, 16, 16, 6).astype(np.float32)
    got = np.asarray(avg_pool_2d(jnp.asarray(x), 2, 2))
    want = F.avg_pool2d(torch.from_numpy(x.transpose(0, 3, 1, 2)), 2, 2)
    np.testing.assert_allclose(got, want.numpy().transpose(0, 2, 3, 1),
                               atol=1e-6)


def test_projections_match_reference(ref):
    from monoport.lib.modeling.geometry import orthogonal as t_ortho
    from monoport.lib.modeling.geometry import perspective as t_persp

    pts = RNG.randn(2, 3, 40).astype(np.float32)      # torch is [B, 3, N]
    calib = RNG.randn(2, 4, 4).astype(np.float32)
    calib[:, 2, :] += 3.0  # keep z away from 0 for perspective divide

    want_o = t_ortho(torch.from_numpy(pts), torch.from_numpy(calib)).numpy()
    got_o = np.asarray(orthogonal(jnp.asarray(pts.transpose(0, 2, 1)),
                                  jnp.asarray(calib)))
    np.testing.assert_allclose(got_o, want_o.transpose(0, 2, 1),
                               atol=1e-5, rtol=1e-4)

    want_p = t_persp(torch.from_numpy(pts), torch.from_numpy(calib)).numpy()
    got_p = np.asarray(perspective(jnp.asarray(pts.transpose(0, 2, 1)),
                                   jnp.asarray(calib)))
    np.testing.assert_allclose(got_p, want_p.transpose(0, 2, 1),
                               atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize("soft_onehot", [False, True])
def test_depth_normalizer(ref, soft_onehot):
    from monoport.lib.modeling.normalizers.DepthNormalizer import (
        DepthNormalizer as TorchDN)
    from types import SimpleNamespace

    z = RNG.uniform(-1.2, 1.2, size=(2, 1, 33)).astype(np.float32)
    opt = SimpleNamespace(soft_onehot=soft_onehot, soft_dim=16, scale=1.28)
    want = TorchDN(opt)(torch.from_numpy(z)).numpy()       # [B, D, N]

    dn = DepthNormalizer(soft_onehot=soft_onehot, soft_dim=16, scale=1.28)
    got = np.asarray(dn(jnp.asarray(z.transpose(0, 2, 1))))  # [B, N, D]
    np.testing.assert_allclose(got, want.transpose(0, 2, 1), atol=1e-6)
