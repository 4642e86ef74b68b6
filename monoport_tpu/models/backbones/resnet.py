"""Johnson-style ResNet generator (netC color backbone).

Reference contract: monoport/lib/modeling/backbones/ResBlkFilters.py —
ReflectionPad + 7x7 stem, two stride-2 downsamples, 6 ResNet blocks at 256
channels (the last block omits its final norm, :74-77), single-stage
single-level output [B, H/4, W/4, 256]. GroupNorm(32), reflect padding,
convs without bias (use_bias only for instance norm).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .hourglass import make_norm


def _reflect_pad(x: jax.Array, p: int) -> jax.Array:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


class ResnetBlock(nn.Module):
    dim: int
    norm: str = "group"
    use_bias: bool = False
    last: bool = False

    def setup(self):
        self.conv1 = nn.Conv(self.dim, (3, 3), padding="VALID",
                             use_bias=self.use_bias, name="conv1")
        self.norm1 = make_norm(self.norm, "norm1")
        self.conv2 = nn.Conv(self.dim, (3, 3), padding="VALID",
                             use_bias=self.use_bias, name="conv2")
        if not self.last:
            self.norm2 = make_norm(self.norm, "norm2")

    def __call__(self, x: jax.Array) -> jax.Array:
        y = nn.relu(self.norm1(self.conv1(_reflect_pad(x, 1))))
        y = self.conv2(_reflect_pad(y, 1))
        if not self.last:
            y = self.norm2(y)
        return x + y


class ResnetFilter(nn.Module):
    output_nc: int = 256
    ngf: int = 64
    n_blocks: int = 6
    norm: str = "group"
    use_bias: bool = False
    use_tanh: bool = False

    def setup(self):
        self.conv_stem = nn.Conv(self.ngf, (7, 7), padding="VALID",
                                 use_bias=self.use_bias, name="conv_stem")
        self.norm_stem = make_norm(self.norm, "norm_stem")
        downs = []
        for i in range(2):
            mult = 2 ** i
            downs.append((
                nn.Conv(self.ngf * mult * 2, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), use_bias=self.use_bias,
                        name=f"down{i}_conv"),
                make_norm(self.norm, f"down{i}_norm"),
            ))
        self.downs = downs
        dim = self.ngf * 4
        self.blocks = [
            ResnetBlock(dim, self.norm, self.use_bias,
                        last=(i == self.n_blocks - 1), name=f"block{i}")
            for i in range(self.n_blocks)
        ]

    def __call__(self, x: jax.Array) -> list[tuple[jax.Array, ...]]:
        x = nn.relu(self.norm_stem(self.conv_stem(_reflect_pad(x, 3))))
        for conv, norm in self.downs:
            x = nn.relu(norm(conv(x)))
        for block in self.blocks:
            x = block(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return [(x,)]


def PIFuResBlkFilters(opt=None, name=None) -> ResnetFilter:
    """Factory matching the PIFu netC config (ResBlkFilters.py:142-147)."""
    opt = opt or {}
    return ResnetFilter(use_tanh=opt.get("use_tanh", False),
                        norm=opt.get("norm", "group"), name=name)


if __name__ == "__main__":
    # smoke benchmark (reference ResBlkFilters.py:150-165: 39.68 fps)
    import jax
    from ...utils.profiling import device_time

    model = PIFuResBlkFilters()
    x = jnp.zeros((1, 512, 512, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    print(model.apply(variables, x)[0][0].shape)
    dt = device_time(lambda im: model.apply(variables, im)[0][0], x)
    print(f"{1 / dt:.2f} fps")
