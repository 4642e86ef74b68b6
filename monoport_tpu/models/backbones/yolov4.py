"""YOLOv4 (CSPDarknet53 + SPP + PAN) multi-scale encoder.

Reference contract: monoport/lib/modeling/backbones/Yolov4Filters.py —
Mish-activated CSP downsample stages (1-2-8-8-4 residual blocks), SPP
neck with 5/9/13 max-pool pyramid, PAN top-down path, and a 3-scale head
returning ``[(out0,), (out1,), (out2,)]`` with 256 channels each
(:405-416). The reference loads darknet ``yolov4.conv.137`` weights by
positional zip from a hardcoded path (:419-421); here weights come from
the standard converter / random init, and the path is config.

Norm note: reference uses BatchNorm; default here is GroupNorm (TPU
training friendly), 'batch' available as inference-mode running stats.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resize import interpolate_2d
from .hourglass import make_norm as _make_norm_32

PAD1 = ((1, 1), (1, 1))


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def _norm(norm: str, ch: int, name: str):
    if norm == "group":
        return nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-5, name=name)
    return _make_norm_32(norm, name)


class ConvBnAct(nn.Module):
    ch: int
    kernel: int
    stride: int = 1
    act: str = "mish"
    bn: bool = True
    bias: bool = False
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(self.ch, (self.kernel,) * 2, strides=(self.stride,) * 2,
                    padding=((pad, pad), (pad, pad)),
                    use_bias=self.bias or not self.bn, name="conv")(x)
        if self.bn:
            x = _norm(self.norm, self.ch, "bn")(x)
        if self.act == "mish":
            return mish(x)
        if self.act == "leaky":
            return nn.leaky_relu(x, negative_slope=0.1)
        return x  # linear


class ResBlock(nn.Module):
    ch: int
    nblocks: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        for i in range(self.nblocks):
            h = ConvBnAct(self.ch, 1, norm=self.norm, name=f"b{i}_conv1")(x)
            h = ConvBnAct(self.ch, 3, norm=self.norm, name=f"b{i}_conv2")(h)
            x = x + h
        return x


class DownSample1(nn.Module):
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        c = lambda ch, k, s, n: ConvBnAct(ch, k, s, norm=self.norm, name=n)
        x1 = c(32, 3, 1, "conv1")(x)
        x2 = c(64, 3, 2, "conv2")(x1)
        x3 = c(64, 1, 1, "conv3")(x2)
        x4 = c(64, 1, 1, "conv4")(x2)
        x5 = c(32, 1, 1, "conv5")(x4)
        x6 = c(64, 3, 1, "conv6")(x5) + x4
        x7 = c(64, 1, 1, "conv7")(x6)
        x8 = c(64, 1, 1, "conv8")(jnp.concatenate([x7, x3], -1))
        return x8


class DownSampleCSP(nn.Module):
    """DownSample2-5 share this CSP pattern (Yolov4Filters.py:132-229)."""
    ch: int           # output channels
    nblocks: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        half = self.ch // 2
        c = lambda ch, k, s, n: ConvBnAct(ch, k, s, norm=self.norm, name=n)
        x1 = c(self.ch, 3, 2, "conv1")(x)
        x2 = c(half, 1, 1, "conv2")(x1)
        x3 = c(half, 1, 1, "conv3")(x1)
        r = ResBlock(half, self.nblocks, self.norm, name="res")(x3)
        x4 = c(half, 1, 1, "conv4")(r)
        x5 = c(self.ch, 1, 1, "conv5")(jnp.concatenate([x4, x2], -1))
        return x5


def _maxpool(x, k):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, 1, 1, 1),
        [(0, 0), (k // 2, k // 2), (k // 2, k // 2), (0, 0)])


class Neck(nn.Module):
    """SPP + PAN top-down (Yolov4Filters.py:232-313)."""
    norm: str = "group"

    @nn.compact
    def __call__(self, d5, d4, d3):
        c = lambda ch, k, n: ConvBnAct(ch, k, 1, act="leaky",
                                       norm=self.norm, name=n)
        x1 = c(512, 1, "conv1")(d5)
        x2 = c(1024, 3, "conv2")(x1)
        x3 = c(512, 1, "conv3")(x2)
        spp = jnp.concatenate(
            [_maxpool(x3, 13), _maxpool(x3, 9), _maxpool(x3, 5), x3], -1)
        x4 = c(512, 1, "conv4")(spp)
        x5 = c(1024, 3, "conv5")(x4)
        x6 = c(512, 1, "conv6")(x5)
        x7 = c(256, 1, "conv7")(x6)
        up = interpolate_2d(x7, d4.shape[1:3], "nearest")
        x8 = c(256, 1, "conv8")(d4)
        x8 = jnp.concatenate([x8, up], -1)
        x9 = c(256, 1, "conv9")(x8)
        x10 = c(512, 3, "conv10")(x9)
        x11 = c(256, 1, "conv11")(x10)
        x12 = c(512, 3, "conv12")(x11)
        x13 = c(256, 1, "conv13")(x12)
        x14 = c(128, 1, "conv14")(x13)
        up2 = interpolate_2d(x14, d3.shape[1:3], "nearest")
        x15 = c(128, 1, "conv15")(d3)
        x15 = jnp.concatenate([x15, up2], -1)
        x16 = c(128, 1, "conv16")(x15)
        x17 = c(256, 3, "conv17")(x16)
        x18 = c(128, 1, "conv18")(x17)
        x19 = c(256, 3, "conv19")(x18)
        x20 = c(128, 1, "conv20")(x19)
        return x20, x13, x6


class Yolov4Head(nn.Module):
    """3-scale output head (Yolov4Filters.py:316-378)."""
    output_ch: int = 256
    norm: str = "group"

    @nn.compact
    def __call__(self, in1, in2, in3):
        c = lambda ch, k, s, n: ConvBnAct(ch, k, s, act="leaky",
                                          norm=self.norm, name=n)
        lin = lambda ch, n: ConvBnAct(ch, 1, 1, act="linear", bn=False,
                                      bias=True, norm=self.norm, name=n)
        x1 = c(256, 3, 1, "conv1")(in1)
        out0 = lin(self.output_ch, "conv2")(x1)

        x3 = c(256, 3, 2, "conv3")(in1)
        x3 = jnp.concatenate([x3, in2], -1)
        x4 = c(256, 1, 1, "conv4")(x3)
        x5 = c(512, 3, 1, "conv5")(x4)
        x6 = c(256, 1, 1, "conv6")(x5)
        x7 = c(512, 3, 1, "conv7")(x6)
        x8 = c(256, 1, 1, "conv8")(x7)
        x9 = c(512, 3, 1, "conv9")(x8)
        out1 = lin(self.output_ch, "conv10")(x9)

        x11 = c(512, 3, 2, "conv11")(x8)
        x11 = jnp.concatenate([x11, in3], -1)
        x12 = c(512, 1, 1, "conv12")(x11)
        x13 = c(1024, 3, 1, "conv13")(x12)
        x14 = c(512, 1, 1, "conv14")(x13)
        x15 = c(1024, 3, 1, "conv15")(x14)
        x16 = c(512, 1, 1, "conv16")(x15)
        x17 = c(1024, 3, 1, "conv17")(x16)
        out2 = lin(self.output_ch, "conv18")(x17)
        return [out0, out1, out2]


class Yolov4(nn.Module):
    output_ch: int = 256
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        d1 = DownSample1(self.norm, name="down1")(x)
        d2 = DownSampleCSP(128, 2, self.norm, name="down2")(d1)
        d3 = DownSampleCSP(256, 8, self.norm, name="down3")(d2)
        d4 = DownSampleCSP(512, 8, self.norm, name="down4")(d3)
        d5 = DownSampleCSP(1024, 4, self.norm, name="down5")(d4)
        x20, x13, x6 = Neck(self.norm, name="neek")(d5, d4, d3)
        out = Yolov4Head(self.output_ch, self.norm, name="head")(
            x20, x13, x6)
        return [(out[0],), (out[1],), (out[2],)]


def Yolov4Filters(opt=None, name=None) -> Yolov4:
    opt = opt or {}
    return Yolov4(output_ch=opt.get("output_ch", 256),
                  norm=opt.get("norm", "group"), name=name)
