"""Stacked-hourglass image encoder (netG backbone).

Reference contract: monoport/lib/modeling/backbones/HGFilters.py — 7x7/s2
stem, ConvBlocks with avg-pool downsampling, ``num_stack`` hourglasses of
depth ``num_hourglass`` at 256 channels with intermediate supervision heads;
each stage emits a [B, 128, 128, 256] (NHWC) feature map from 512x512 input.

Numerical-parity notes (these silently break pretrained weights if wrong):
  * hourglass upsampling is **bicubic align_corners=True** (HGFilters.py:108),
    implemented here as dense per-axis matmuls (ops/resize.py);
  * GroupNorm(32, eps=1e-5) everywhere in the PIFu config;
  * ConvBlock is the 3-way split-channel residual (out/2, out/4, out/4
    concat, HGFilters.py:15-62).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.resize import avg_pool_2d, upsample2x_bicubic

PAD1 = ((1, 1), (1, 1))


def adaptive_groups(channels: int, max_groups: int = 32) -> int:
    """Largest divisor of ``channels`` that is <= max_groups."""
    for g in range(min(max_groups, channels), 0, -1):
        if channels % g == 0:
            return g
    return 1


def make_norm(norm: str, name: str, channels: int | None = None) -> nn.Module:
    """'group' (PIFu configs), 'batch' (inference-mode running stats, for
    converted reference HRNet/Yolov4 weights), or 'batch_train' (training-
    mode BN: batch statistics + running-stat updates via
    mutable=['batch_stats']; reference default for HRNet/Yolov4,
    HRNetFilters.py:10). Under jit sharding the batch reduction is GLOBAL
    across data-parallel shards — stronger than the reference's
    nn.DataParallel per-GPU statistics. momentum 0.9 == torch's 0.1."""
    if norm == "group":
        groups = 32 if channels is None else adaptive_groups(channels)
        return nn.GroupNorm(num_groups=groups, epsilon=1e-5, name=name)
    if norm in ("batch", "batch_train"):
        return nn.BatchNorm(use_running_average=(norm != "batch_train"),
                            epsilon=1e-5, momentum=0.9, name=name)
    raise ValueError(f"unknown norm: {norm}")


class ConvBlock(nn.Module):
    in_planes: int
    out_planes: int
    norm: str = "group"

    def setup(self):
        o = self.out_planes
        self.conv1 = nn.Conv(o // 2, (3, 3), padding=PAD1, use_bias=False,
                             name="conv1")
        self.conv2 = nn.Conv(o // 4, (3, 3), padding=PAD1, use_bias=False,
                             name="conv2")
        self.conv3 = nn.Conv(o // 4, (3, 3), padding=PAD1, use_bias=False,
                             name="conv3")
        self.bn1 = make_norm(self.norm, "bn1")
        self.bn2 = make_norm(self.norm, "bn2")
        self.bn3 = make_norm(self.norm, "bn3")
        if self.in_planes != self.out_planes:
            self.bn4 = make_norm(self.norm, "bn4")
            self.downsample_conv = nn.Conv(o, (1, 1), use_bias=False,
                                           name="downsample_conv")

    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        out1 = self.conv1(nn.relu(self.bn1(x)))
        out2 = self.conv2(nn.relu(self.bn2(out1)))
        out3 = self.conv3(nn.relu(self.bn3(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if self.in_planes != self.out_planes:
            residual = self.downsample_conv(nn.relu(self.bn4(residual)))
        return out + residual


class HourGlass(nn.Module):
    depth: int
    features: int
    norm: str = "group"

    def setup(self):
        blocks = {}
        for level in range(self.depth, 0, -1):
            f = self.features
            blocks[f"b1_{level}"] = ConvBlock(f, f, self.norm,
                                              name=f"b1_{level}")
            blocks[f"b2_{level}"] = ConvBlock(f, f, self.norm,
                                              name=f"b2_{level}")
            if level == 1:
                blocks["b2_plus_1"] = ConvBlock(f, f, self.norm,
                                                name="b2_plus_1")
            blocks[f"b3_{level}"] = ConvBlock(f, f, self.norm,
                                              name=f"b3_{level}")
        self.blocks = blocks

    def _recurse(self, level: int, inp: jax.Array) -> jax.Array:
        up1 = self.blocks[f"b1_{level}"](inp)
        low1 = self.blocks[f"b2_{level}"](avg_pool_2d(inp, 2, 2))
        if level > 1:
            low2 = self._recurse(level - 1, low1)
        else:
            low2 = self.blocks["b2_plus_1"](low1)
        low3 = self.blocks[f"b3_{level}"](low2)
        up2 = upsample2x_bicubic(low3)
        return up1 + up2

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._recurse(self.depth, x)


class HGFilter(nn.Module):
    """Multi-stage hourglass encoder (HGFilters.py:117-204).

    Input [B, H, W, 3] -> list of per-stage single-level tuples
    [([B, H/4, W/4, hourglass_dim],), ...] of length ``num_stack``.
    """
    num_stack: int = 4
    num_hourglass: int = 2
    hourglass_dim: int = 256
    norm: str = "group"
    hg_down: str = "ave_pool"

    def setup(self):
        self.conv1 = nn.Conv(64, (7, 7), strides=(2, 2),
                             padding=((3, 3), (3, 3)), name="conv1")
        self.bn1 = make_norm(self.norm, "bn1")
        if self.hg_down == "ave_pool":
            self.conv2 = ConvBlock(64, 128, self.norm, name="conv2")
        elif self.hg_down == "conv64":
            self.conv2 = ConvBlock(64, 64, self.norm, name="conv2")
            self.down_conv2 = nn.Conv(128, (3, 3), strides=(2, 2),
                                      padding=PAD1, name="down_conv2")
        elif self.hg_down == "conv128":
            self.conv2 = ConvBlock(64, 128, self.norm, name="conv2")
            self.down_conv2 = nn.Conv(128, (3, 3), strides=(2, 2),
                                      padding=PAD1, name="down_conv2")
        else:
            raise ValueError(f"unknown hg_down: {self.hg_down}")
        self.conv3 = ConvBlock(128, 128, self.norm, name="conv3")
        self.conv4 = ConvBlock(128, 256, self.norm, name="conv4")

        stacks = []
        for i in range(self.num_stack):
            stage = {
                "m": HourGlass(self.num_hourglass, 256, self.norm,
                               name=f"m{i}"),
                "top_m": ConvBlock(256, 256, self.norm, name=f"top_m_{i}"),
                "conv_last": nn.Conv(256, (1, 1), name=f"conv_last{i}"),
                "bn_end": make_norm(self.norm, f"bn_end{i}"),
                "l": nn.Conv(self.hourglass_dim, (1, 1), name=f"l{i}"),
            }
            if i < self.num_stack - 1:
                stage["bl"] = nn.Conv(256, (1, 1), name=f"bl{i}")
                stage["al"] = nn.Conv(256, (1, 1), name=f"al{i}")
            stacks.append(stage)
        self.stacks = stacks

    def __call__(self, x: jax.Array) -> list[tuple[jax.Array, ...]]:
        x = nn.relu(self.bn1(self.conv1(x)))
        if self.hg_down == "ave_pool":
            x = avg_pool_2d(self.conv2(x), 2, 2)
        else:
            x = self.down_conv2(self.conv2(x))
        x = self.conv3(x)
        x = self.conv4(x)

        previous = x
        outputs: list[tuple[jax.Array, ...]] = []
        for i, stage in enumerate(self.stacks):
            hg = stage["m"](previous)
            ll = stage["top_m"](hg)
            ll = nn.relu(stage["bn_end"](stage["conv_last"](ll)))
            tmp_out = stage["l"](ll)
            outputs.append((tmp_out,))
            if i < self.num_stack - 1:
                previous = previous + stage["bl"](ll) + stage["al"](tmp_out)
        return outputs


def PIFuHGFilters(opt=None, name=None) -> HGFilter:
    """Factory matching the PIFu config (HGFilters.py:207-216)."""
    opt = opt or {}
    return HGFilter(
        num_stack=opt.get("num_stack", 4),
        num_hourglass=opt.get("num_hourglass", 2),
        hourglass_dim=opt.get("hourglass_dim", 256),
        norm=opt.get("norm", "group"),
        hg_down=opt.get("hg_down", "ave_pool"),
        name=name,
    )


if __name__ == "__main__":
    # smoke benchmark (reference HGFilters.py:219-235: 27.42 fps on 2080Ti)
    import jax
    from ...utils.profiling import device_time

    model = PIFuHGFilters()
    x = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    for stage, outs in enumerate(out):
        for lvl, o in enumerate(outs):
            print(f"stage: {stage}, lvl: {lvl}", o.shape)
    dt = device_time(lambda im: model.apply(variables, im)[-1][0], x)
    print(f"{1 / dt:.2f} fps")
