"""Pallas TPU kernel: the skip-concat surface-classifier MLP.

This is the hot inner loop of the whole system (SURVEY §2: geometry.index
+ SurfaceClassifier are the per-frame bottleneck — ~0.5M point evals per
257^3 frame). The XLA path materializes each [N, 1024]/[N, 512]/... hidden
activation in HBM between GEMMs; this kernel keeps ALL weights resident in
VMEM and streams point tiles through the full 5-layer MLP in one pass —
HBM traffic drops from ~7 floats/point/layer to exactly
(C_in + C_out) floats/point total.

Design notes (see /opt/skills/guides/pallas_guide.md):
  * the reference MLP concatenates the input features into every layer
    (SurfaceClassifier.py:49-56: y = f(cat[y, tmpy])); concat inside the
    kernel is avoided by splitting each weight matrix into W_h (hidden
    rows) and W_x (skip rows): f(cat[h, x]) == W_h h + W_x x + b;
  * channel dims are zero-padded to multiples of 128 (MXU lane width);
    zero padding is exact: padded input columns multiply zero weights;
  * points are tiled along the grid; each tile is a [TILE_N, C] block in
    VMEM; all matmuls run on the MXU with fp32 accumulation;
  * compute dtype bf16 by default (weights + activations), accum fp32.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_mlp_params(head_params: dict, filter_channels: Sequence[int],
                    dtype=jnp.bfloat16):
    """Split/pad flax SurfaceClassifier params for the kernel.

    Returns dict with lists: w_h[i] [H_pad, O], w_x[i] [C_pad, O] (None for
    layer 0's w_x), b[i] [1, O]. Layer 0: w_h is the full input weight.
    jnp-based so it works on both concrete arrays and tracers (packing can
    run inside the jitted frame program; XLA hoists it).
    """
    chans = list(filter_channels)
    c_in = chans[0]
    c_pad = _round_up(c_in, 128)
    w_h, w_x, b = [], [], []
    for i in range(len(chans) - 1):
        kernel = jnp.asarray(head_params[f"filters_{i}"]["kernel"])
        bias = jnp.asarray(head_params[f"filters_{i}"]["bias"])
        out_dim = chans[i + 1]
        out_pad = _round_up(out_dim, 128)
        if i == 0:
            assert kernel.shape == (c_in, out_dim)
            wh = jnp.zeros((c_pad, out_pad), dtype).at[
                :c_in, :out_dim].set(kernel.astype(dtype))
            wx = None
        else:
            h_dim = chans[i]
            h_pad = _round_up(h_dim, 128)
            assert kernel.shape == (h_dim + c_in, out_dim), (
                kernel.shape, h_dim, c_in, out_dim)
            wh = jnp.zeros((h_pad, out_pad), dtype).at[
                :h_dim, :out_dim].set(kernel[:h_dim].astype(dtype))
            wx = jnp.zeros((c_pad, out_pad), dtype).at[
                :c_in, :out_dim].set(kernel[h_dim:].astype(dtype))
        bb = jnp.zeros((1, out_pad), jnp.float32).at[0, :out_dim].set(bias)
        w_h.append(wh)
        w_x.append(wx)
        b.append(bb)
    return {"w_h": w_h, "w_x": w_x, "b": b, "c_in": c_in, "c_pad": c_pad,
            "out_dim": chans[-1]}


def _mlp_kernel(n_layers: int, last_op: str, x_ref, *refs):
    """Kernel body: refs = [w_h0..w_hL, w_x1..w_xL, b0..bL, out_ref]."""
    w_h = refs[:n_layers]
    w_x = refs[n_layers:2 * n_layers - 1]   # layers 1..L-1
    b = refs[2 * n_layers - 1:3 * n_layers - 1]
    out_ref = refs[-1]

    x = x_ref[...]
    h = x
    for i in range(n_layers):
        acc = jnp.dot(h, w_h[i][...],
                      preferred_element_type=jnp.float32)
        if i > 0:
            acc = acc + jnp.dot(x, w_x[i - 1][...],
                                preferred_element_type=jnp.float32)
        acc = acc + b[i][...]
        if i != n_layers - 1:
            acc = jnp.where(acc > 0, acc, acc * 0.01)  # leaky_relu(0.01)
        h = acc.astype(x.dtype) if i != n_layers - 1 else acc
    if last_op == "sigmoid":
        h = jax.nn.sigmoid(h)
    elif last_op == "tanh":
        h = jnp.tanh(h)
    out_ref[...] = h.astype(out_ref.dtype)


def apply_packed(packed: dict, x: jax.Array, last_op: str,
                 tile_n: int = 512, compute_dtype=jnp.bfloat16,
                 interpret: bool = False) -> jax.Array:
    """Run the fused kernel on [B, N, C_in] -> [B, N, out_dim]."""
    b, n, c = x.shape
    p = packed
    assert c == p["c_in"], (c, p["c_in"])
    n_layers = len(p["w_h"])
    tile = tile_n
    n_pad = _round_up(n, tile)
    xp = jnp.zeros((b, n_pad, p["c_pad"]), compute_dtype)
    xp = xp.at[:, :n, :c].set(x.astype(compute_dtype))
    xp = xp.reshape(b * (n_pad // tile), tile, p["c_pad"])

    weights = ([w for w in p["w_h"]]
               + [w for w in p["w_x"] if w is not None]
               + list(p["b"]))
    out_pad = p["b"][-1].shape[1]

    kernel = functools.partial(_mlp_kernel, n_layers, last_op)
    out = pl.pallas_call(
        kernel,
        grid=(xp.shape[0],),
        in_specs=[pl.BlockSpec((1, tile, p["c_pad"]),
                               lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, tile, out_pad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((xp.shape[0], tile, out_pad),
                                       jnp.float32),
        interpret=interpret,
    )(xp, *weights)
    return out.reshape(b, n_pad, out_pad)[:, :n, :p["out_dim"]]


class PallasSurfaceMLP:
    """Jit-callable fused MLP: [B, N, C_in] -> [B, N, out_dim].

    Drop-in accelerator for SurfaceClassifier.apply on the query hot path
    (same arithmetic; bf16 compute / fp32 accumulation by default).
    """

    def __init__(self, head_params: dict,
                 filter_channels: Sequence[int],
                 last_op: str = "sigmoid",
                 tile_n: int = 512,
                 compute_dtype=jnp.bfloat16,
                 interpret: bool = False):
        self.packed = pack_mlp_params(head_params, filter_channels,
                                      compute_dtype)
        self.last_op = last_op
        self.tile_n = tile_n
        self.compute_dtype = compute_dtype
        self.interpret = interpret
        self._call = jax.jit(functools.partial(
            apply_packed, self.packed, last_op=last_op, tile_n=tile_n,
            compute_dtype=compute_dtype, interpret=interpret))

    def __call__(self, x: jax.Array) -> jax.Array:
        return self._call(x)
