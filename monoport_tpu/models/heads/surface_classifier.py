"""Point-wise occupancy / color MLP.

Reference contract: monoport/lib/modeling/heads/SurfaceClassifier.py:6-87 —
a stack of 1x1 convolutions (here: Dense layers over point-major [B, N, C]),
leaky-ReLU between layers, and (in the PIFu configs) a skip-concat of the
input feature into every layer after the first (``no_residual=False``).

TPU note: each layer is one [B*N, Cin] x [Cin, Cout] GEMM on the MXU. The
fused Pallas kernel in monoport_tpu/ops/pallas/fused_mlp.py implements the
same arithmetic while keeping activations in VMEM.
"""

from __future__ import annotations

from typing import Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class SurfaceClassifier(nn.Module):
    filter_channels: Sequence[int]
    num_views: int = 1
    no_residual: bool = True
    last_op: Callable[[jax.Array], jax.Array] | None = None
    # Variance-scaling multiplier for the OUTPUT layer's kernel init only
    # (1.0 = flax default lecun_normal). Training-from-scratch knob; has
    # no effect on converted/loaded weights. The netC color head needs a
    # tiny value: its un-normalized ResnetFilter features (absmax ~45 at
    # init) push the default-init final tanh to ~40% saturation, and the
    # r5 PPL run measured the resulting zero-gradient plateau (mean L1
    # pinned at 0.82 for 12 epochs, held-out PSNR 6.4 -> 5.4 dB).
    out_init_scale: float = 1.0

    def setup(self):
        chans = list(self.filter_channels)
        layers = []
        for l in range(len(chans) - 1):
            kw = {}
            if l == len(chans) - 2 and self.out_init_scale != 1.0:
                kw["kernel_init"] = nn.initializers.variance_scaling(
                    self.out_init_scale, "fan_in", "truncated_normal")
            # input width includes the skip-concat for layers > 0
            layers.append(nn.Dense(chans[l + 1], name=f"filters_{l}", **kw))
        self.filters = layers

    def __call__(self, feature: jax.Array) -> jax.Array:
        """[B, N, C_in] -> [B, N, C_out]."""
        y = feature
        tmpy = feature
        n_layers = len(self.filters)
        for i, f in enumerate(self.filters):
            if self.no_residual or i == 0:
                y = f(y)
            else:
                y = f(jnp.concatenate([y, tmpy], axis=-1))
            if i != n_layers - 1:
                y = nn.leaky_relu(y, negative_slope=0.01)
            if self.num_views > 1 and i == n_layers // 2:
                b = y.shape[0] // self.num_views
                y = y.reshape(b, self.num_views, *y.shape[1:]).mean(axis=1)
                tmpy = feature.reshape(
                    b, self.num_views, *feature.shape[1:]).mean(axis=1)
        if self.last_op is not None:
            y = self.last_op(y)
        return y


def PIFuNetGMLP(opt=None, name=None) -> SurfaceClassifier:
    """Occupancy head: [257,1024,512,256,128,1] + sigmoid (reference :74-79)."""
    return SurfaceClassifier(
        filter_channels=(257, 1024, 512, 256, 128, 1),
        num_views=1, no_residual=False, last_op=jax.nn.sigmoid, name=name)


def PIFuNetCMLP(opt=None, name=None) -> SurfaceClassifier:
    """Color head: [513,1024,512,256,128,3] + tanh (reference :82-87).

    out_init_scale=1e-4 starts the tanh UNsaturated when training from
    scratch (see SurfaceClassifier.out_init_scale); loaded weights are
    untouched, so golden-parity and shipped-checkpoint behavior is
    identical."""
    return SurfaceClassifier(
        filter_channels=(513, 1024, 512, 256, 128, 3),
        num_views=1, no_residual=False, last_op=jnp.tanh,
        out_init_scale=1e-4, name=name)


if __name__ == "__main__":
    # smoke benchmark (reference SurfaceClassifier.py:90-116:
    # netG 38.13 fps / netC 23.71 fps at 50000 points on 2080Ti)
    import jax
    from ...utils.profiling import device_time

    from ...ops.pallas.fused_mlp import PallasSurfaceMLP
    from . import HEAD_SPECS

    for name in ("PIFuNetGMLP", "PIFuNetCMLP"):
        chans, last_op = HEAD_SPECS[name]
        model = {"PIFuNetGMLP": PIFuNetGMLP, "PIFuNetCMLP": PIFuNetCMLP}[name]()
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 50000, chans[0]))
        variables = model.init(jax.random.PRNGKey(0), x)
        print(model.apply(variables, x).shape)
        dt = device_time(lambda v: model.apply(variables, v), x)
        kernel = PallasSurfaceMLP(variables["params"], chans, last_op)
        dtp = device_time(kernel._call, x)
        print(f"{name}: xla {1 / dt:.2f} fps ({50000 / dt / 1e6:.1f} M "
              f"pts/s) | pallas {1 / dtp:.2f} fps "
              f"({50000 / dtp / 1e6:.1f} M pts/s)")
