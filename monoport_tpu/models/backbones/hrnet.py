"""HRNet-V2-W18 backbone family (faster alternative geometry encoders).

Reference contract: monoport/lib/modeling/backbones/HRNetFilters.py —
multi-branch multi-resolution fusion (HighResolutionModule:103-220), stem
of two stride-2 3x3 convs, Bottleneck stage 1, Basic stages 2-4, fuse
layers with nearest upsampling, optional ``last_layer`` that concatenates
all four scales into a 256-ch map (:284-301, :414-421), and six config
factories (:441-715). Exported default: HRNetV2_W18_small_v2_balance_last
(backbones/__init__.py:4).

Norm note: the reference hardcodes BatchNorm (HRNetFilters.py:10, with a
commented GroupNorm(32) alternative); this build defaults to GroupNorm
(TPU-friendly: no cross-replica stat sync under data parallelism), with
'batch' available as inference-mode running-stats norm.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.resize import interpolate_2d
from .hourglass import make_norm

PAD1 = ((1, 1), (1, 1))


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "group"
    expansion = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=PAD1, use_bias=False, name="conv1")(x)
        out = nn.relu(make_norm(self.norm, "bn1", self.planes)(out))
        out = nn.Conv(self.planes, (3, 3), padding=PAD1, use_bias=False,
                      name="conv2")(out)
        out = make_norm(self.norm, "bn2", self.planes)(out)
        if x.shape[-1] != self.planes or self.stride != 1:
            residual = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False, name="down_conv")(x)
            residual = make_norm(self.norm, "down_bn", self.planes)(residual)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "group"
    expansion = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = nn.relu(make_norm(self.norm, "bn1", self.planes)(out))
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride,) * 2,
                      padding=PAD1, use_bias=False, name="conv2")(out)
        out = nn.relu(make_norm(self.norm, "bn2", self.planes)(out))
        out = nn.Conv(self.planes * 4, (1, 1), use_bias=False,
                      name="conv3")(out)
        out = make_norm(self.norm, "bn3", self.planes * 4)(out)
        if x.shape[-1] != self.planes * 4 or self.stride != 1:
            residual = nn.Conv(self.planes * 4, (1, 1),
                               strides=(self.stride,) * 2,
                               use_bias=False, name="down_conv")(x)
            residual = make_norm(self.norm, "down_bn", self.planes * 4)(residual)
        return nn.relu(out + residual)


_BLOCKS = {"Basic": BasicBlock, "Bottleneck": Bottleneck}


class HighResolutionModule(nn.Module):
    """Parallel branches + all-to-all fusion (HRNetFilters.py:103-220)."""
    num_branches: int
    block: str
    num_blocks: Sequence[int]
    num_channels: Sequence[int]
    norm: str = "group"

    @nn.compact
    def __call__(self, xs):
        block = _BLOCKS[self.block]
        outs = []
        for i in range(self.num_branches):
            y = xs[i]
            for k in range(self.num_blocks[i]):
                y = block(self.num_channels[i], norm=self.norm,
                          name=f"branch{i}_block{k}")(y)
            outs.append(y)
        if self.num_branches == 1:
            return outs

        fused = []
        for i in range(self.num_branches):
            acc = None
            for j in range(self.num_branches):
                cij = outs[i].shape[-1]
                if j == i:
                    y = outs[j]
                elif j > i:
                    # 1x1 conv + norm + nearest 2^(j-i) upsample
                    y = nn.Conv(cij, (1, 1), use_bias=False,
                                name=f"fuse{i}_{j}_conv")(outs[j])
                    y = make_norm(self.norm, f"fuse{i}_{j}_bn", cij)(y)
                    h, w = outs[i].shape[1:3]
                    y = interpolate_2d(y, (h, w), "nearest")
                else:
                    y = outs[j]
                    for k in range(i - j):
                        last = k == i - j - 1
                        c_out = cij if last else outs[j].shape[-1]
                        y = nn.Conv(c_out, (3, 3), strides=(2, 2),
                                    padding=PAD1, use_bias=False,
                                    name=f"fuse{i}_{j}_conv{k}")(y)
                        y = make_norm(self.norm, f"fuse{i}_{j}_bn{k}", c_out)(y)
                        if not last:
                            y = nn.relu(y)
                acc = y if acc is None else acc + y
            fused.append(nn.relu(acc))
        return fused


class HRNet(nn.Module):
    cfg: dict
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        cfg = dict(self.cfg)
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=PAD1,
                    use_bias=False, name="conv1")(x)
        x = nn.relu(make_norm(self.norm, "bn1")(x))
        x = nn.Conv(64, (3, 3), strides=(2, 2), padding=PAD1,
                    use_bias=False, name="conv2")(x)
        x = nn.relu(make_norm(self.norm, "bn2")(x))

        # stage 1
        s1 = cfg["STAGE1"]
        block = _BLOCKS[s1["BLOCK"]]
        for k in range(s1["NUM_BLOCKS"][0]):
            x = block(s1["NUM_CHANNELS"][0], norm=self.norm,
                      name=f"layer1_{k}")(x)
        ys = [x]
        prev_channels = [x.shape[-1]]

        for si in (2, 3, 4):
            key = f"STAGE{si}"
            if key not in cfg:
                break
            sc = cfg[key]
            block = _BLOCKS[sc["BLOCK"]]
            channels = [c * block.expansion for c in sc["NUM_CHANNELS"]]
            # transition: adapt existing branches / spawn new ones
            xs = []
            for i in range(sc["NUM_BRANCHES"]):
                if i < len(ys):
                    if prev_channels[i] != channels[i]:
                        y = nn.Conv(channels[i], (3, 3), padding=PAD1,
                                    use_bias=False,
                                    name=f"t{si}_{i}_conv")(ys[i])
                        y = nn.relu(make_norm(self.norm, f"t{si}_{i}_bn", channels[i])(y))
                    else:
                        y = ys[i]
                else:
                    y = nn.Conv(channels[i], (3, 3), strides=(2, 2),
                                padding=PAD1, use_bias=False,
                                name=f"t{si}_{i}_conv")(ys[-1])
                    y = nn.relu(make_norm(self.norm, f"t{si}_{i}_bn", channels[i])(y))
                xs.append(y)
            for m in range(sc["NUM_MODULES"]):
                xs = HighResolutionModule(
                    sc["NUM_BRANCHES"], sc["BLOCK"], sc["NUM_BLOCKS"],
                    channels, norm=self.norm, name=f"stage{si}_m{m}")(xs)
            ys = xs
            prev_channels = [y.shape[-1] for y in ys]

        if cfg.get("last_layer"):
            h, w = ys[0].shape[1:3]
            ups = [ys[0]] + [
                interpolate_2d(y, (h, w), "bilinear", align_corners=True)
                for y in ys[1:]]
            y = jnp.concatenate(ups, axis=-1)
            y = nn.Conv(y.shape[-1], (1, 1), name="last_conv1")(y)
            y = nn.relu(make_norm(self.norm, "last_bn", y.shape[-1])(y))
            # reference uses padding=1 on this 1x1 conv (HRNetFilters.py:299)
            y = nn.Conv(256, (1, 1), padding=((1, 1), (1, 1)),
                        name="last_conv2")(y)
            return [(y,)]
        return [tuple(ys)]


def _small_v2_cfg(c2, c3, c4, last_layer, blocks3=(2, 2, 2),
                  blocks4=(2, 2, 2, 2), mods3=3, mods4=2):
    return {
        "STAGE1": {"NUM_MODULES": 1, "NUM_BRANCHES": 1, "NUM_BLOCKS": [2],
                   "NUM_CHANNELS": [64], "BLOCK": "Bottleneck",
                   "FUSE_METHOD": "SUM"},
        "STAGE2": {"NUM_MODULES": 1, "NUM_BRANCHES": 2,
                   "NUM_BLOCKS": [2, 2], "NUM_CHANNELS": list(c2),
                   "BLOCK": "Basic", "FUSE_METHOD": "SUM"},
        "STAGE3": {"NUM_MODULES": mods3, "NUM_BRANCHES": 3,
                   "NUM_BLOCKS": list(blocks3), "NUM_CHANNELS": list(c3),
                   "BLOCK": "Basic", "FUSE_METHOD": "SUM"},
        "STAGE4": {"NUM_MODULES": mods4, "NUM_BRANCHES": 4,
                   "NUM_BLOCKS": list(blocks4), "NUM_CHANNELS": list(c4),
                   "BLOCK": "Basic", "FUSE_METHOD": "SUM"},
        "last_layer": last_layer,
    }


def _opt_norm(opt) -> str:
    """Reference HRNet hardcodes BatchNorm (HRNetFilters.py:10); the TPU
    default here is GroupNorm — set opt.norm='batch' for converted
    pretrained weights."""
    return opt.get("norm", "group") if opt else "group"


def HRNetV2_W18_small_v2(opt=None, name=None):
    return HRNet(_small_v2_cfg([18, 36], [18, 36, 72], [18, 36, 72, 144],
                               False), norm=_opt_norm(opt), name=name)


def HRNetV2_W18_small_v2_balance(opt=None, name=None):
    return HRNet(_small_v2_cfg([80, 160], [80, 160, 240],
                               [80, 160, 240, 360], False),
                 norm=_opt_norm(opt), name=name)


def HRNetV2_W18_small_v2_balance_gn32(opt=None, name=None):
    return HRNet(_small_v2_cfg([64, 128], [64, 128, 256],
                               [64, 128, 256, 384], False),
                 norm=_opt_norm(opt), name=name)


def HRNetV2_W18_small_v2_balance_last(opt=None, name=None):
    return HRNet(_small_v2_cfg([80, 160], [80, 160, 240],
                               [80, 160, 240, 360], True),
                 norm=_opt_norm(opt), name=name)


def HRNetV2_W18_small_v2_balance_v2(opt=None, name=None):
    return HRNet(_small_v2_cfg([80, 160], [80, 160, 380],
                               [80, 160, 380, 520], False),
                 norm=_opt_norm(opt), name=name)


def HRNetV2_W18_small_v2_deeper(opt=None, name=None):
    return HRNet(_small_v2_cfg([80, 160], [80, 160, 320],
                               [80, 160, 320, 480], False,
                               blocks3=(2, 2, 3), blocks4=(2, 2, 3, 4),
                               mods3=2, mods4=3),
                 norm=_opt_norm(opt), name=name)
