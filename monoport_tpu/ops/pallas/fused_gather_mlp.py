"""Pallas TPU kernel: IN-KERNEL bilinear tap gather + skip-concat MLP.

BASELINE.json's north star reads: pixel-aligned sampling
(monoport/lib/modeling/geometry.py:4-16) + the surface MLP
(heads/SurfaceClassifier.py:39-66) "fuse into a single Pallas kernel".
The shipped fast paths approached that two ways — the ray-structured
kernel (fused_ray_mlp.py: gather ONCE per ray in XLA, MLP in-kernel) and
the separable grid sampling (ops/sampling.index_grid: the gather becomes
two dense matmuls) — but the bilinear gather itself had never run INSIDE
a kernel. This module is that experiment.

Design: the whole feature map rides VMEM (128x128x256 bf16 = 8 MB,
~half of a v5e core's ~16 MB), reshaped to a [H*W, C] row table. Each
grid step processes a tile of R rays: a scalar fori_loop gathers the
ray's four bilinear tap rows by dynamic row index (indices precomputed
in XLA, staged through SMEM; out-of-image taps carry weight 0 exactly
like ops/sampling.index's zeros padding) into four VMEM scratch tiles,
the bilinear combine then runs vectorized, and the tile flows into the
same shared-projection MLP as fused_ray_mlp (z-split skip layers, taps
statically unrolled). T=1 degenerates to a per-POINT fused gather+MLP —
the query shape of rotated-view frames and the coarse hierarchy levels.

MEASURED DEAD END (kept in-tree as the documented experiment; numbers
and probes in DESIGN.md "Round-3 in-kernel tap gather"): (1) a dynamic
single-row slice of a bf16 VMEM table is a Mosaic INTERNAL compile
error (two rows per sublane; the relayout has no codegen), so the
8 MB bf16 table is unreachable; (2) the f32 table at the real map size
is 16 MB — the entire VMEM; (3) at a reduced table size where it does
compile, the scalar gather loop measures 12.5 M rays/s vs 13.9 for the
XLA-gather composition and 16.5+ for the separable grid sampling, same
session. The gather does not belong inside the kernel on this hardware;
the shipped decomposition (gather via XLA or grid matmuls, MLP in
Pallas) stands.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_ray_mlp import _activate, _round_up, pack_ray_mlp_params  # noqa: F401


def _bilinear_taps(uv: jax.Array, h: int, w: int):
    """[B, R, 2] normalized coords -> flat tap indices [B, R, 4] int32 and
    weights [B, R, 4] f32 (align_corners=True, zeros padding — exactly
    ops/sampling.grid_sample_2d's taps)."""
    u, v = uv[..., 0], uv[..., 1]
    x = (u + 1.0) * 0.5 * (w - 1)
    y = (v + 1.0) * 0.5 * (h - 1)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = x - x0
    wy1 = y - y0
    idxs, wgts = [], []
    for yi, wy in ((y0, 1.0 - wy1), (y0 + 1.0, wy1)):
        for xi, wx in ((x0, 1.0 - wx1), (x0 + 1.0, wx1)):
            valid = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
            yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
            idxs.append(yc * w + xc)
            wgts.append(wy * wx * valid.astype(jnp.float32))
    return jnp.stack(idxs, axis=-1), jnp.stack(wgts, axis=-1)


def _gather_ray_kernel(n_layers: int, taps: int, tile_r: int, last_op: str,
                       compute_dtype, idx_ref, wgt_ref, z_ref, table_ref,
                       *refs):
    """refs = [w_h..., w_f..., w_z..., b..., out_ref, tap_scratch]."""
    w_h = refs[:n_layers - 1]
    w_f = refs[n_layers - 1:2 * n_layers - 1]
    w_z = refs[2 * n_layers - 1:3 * n_layers - 1]
    b = refs[3 * n_layers - 1:4 * n_layers - 1]
    out_ref = refs[-2]
    tap = refs[-1]        # VMEM scratch [4, tile_r, C_pad] compute_dtype

    def gather(i, _):
        for k in range(4):             # static unroll: 4 bilinear taps
            tap[k, pl.ds(i, 1), :] = table_ref[pl.ds(idx_ref[0, i, k], 1), :]
        return 0

    jax.lax.fori_loop(0, tile_r, gather, 0)  # Mosaic: unroll=1 only
    wgt = wgt_ref[0]                   # [tile_r, 4] f32, OOB taps are 0
    # bf16 rows x f32 weights promote to f32; combine then back to the
    # compute dtype for the MXU (same combine as grid_sample_2d on a
    # bf16 feature map)
    feat = (tap[0] * wgt[:, 0:1] + tap[1] * wgt[:, 1:2]
            + tap[2] * wgt[:, 2:3]
            + tap[3] * wgt[:, 3:4]).astype(compute_dtype)

    # shared per-ray projections, then the statically-unrolled tap MLP —
    # identical arithmetic to fused_ray_mlp._ray_kernel
    xproj = [jnp.dot(feat, w_f[i][...], preferred_element_type=jnp.float32)
             for i in range(n_layers)]
    for t in range(taps):
        zt = z_ref[0, :, t][:, None].astype(jnp.float32)
        h = None
        for i in range(n_layers):
            acc = xproj[i] + zt * w_z[i][...] + b[i][...]
            if i > 0:
                acc = acc + jnp.dot(h, w_h[i - 1][...],
                                    preferred_element_type=jnp.float32)
            acc = _activate(acc, i, n_layers, last_op)
            h = acc.astype(compute_dtype)
        out_ref[0, t] = acc.astype(out_ref.dtype)


def apply_gather_ray_packed(packed: dict, feat_map: jax.Array,
                            uv: jax.Array, z: jax.Array, last_op: str,
                            tile_r: int = 256,
                            compute_dtype=jnp.bfloat16,
                            interpret: bool = False) -> jax.Array:
    """[1, H, W, C] feature map + [1, R, 2] normalized uv + [1, R, T]
    z-features -> [1, R, T, out_dim]; the gather happens in-kernel.

    The table is cast to ``compute_dtype`` (bf16 keeps the 256-ch map at
    8 MB so it fits VMEM alongside the weights) — taps are combined in
    f32 from bf16 rows, which matches the bf16-feature-map variant of the
    XLA path, NOT the shipped f32-feature one (documented experiment
    deviation). Batch must be 1 (the flagship frame contract,
    RTL/main.py:176)."""
    p = packed
    bsz, h, w, c = feat_map.shape
    assert bsz == 1 and uv.shape[0] == 1
    assert c == p["c_f"], (c, p["c_f"])
    c_pad = p["c_f_pad"]
    r = uv.shape[1]
    taps = z.shape[-1]
    n_layers = len(p["w_f"])

    table = feat_map.reshape(h * w, c).astype(compute_dtype)
    if c_pad != c:
        table = jnp.pad(table, ((0, 0), (0, c_pad - c)))
    idx, wgt = _bilinear_taps(uv, h, w)                  # [1, R, 4] x2

    r_pad = _round_up(r, tile_r)
    idx = jnp.zeros((1, r_pad, 4), jnp.int32).at[:, :r].set(idx)
    wgt = jnp.zeros((1, r_pad, 4), jnp.float32).at[:, :r].set(wgt)
    zp = jnp.zeros((1, r_pad, taps), jnp.float32).at[:, :r].set(
        z.astype(jnp.float32))
    tiles = r_pad // tile_r
    idx = idx.reshape(tiles, tile_r, 4)
    wgt = wgt.reshape(tiles, tile_r, 4)
    zp = zp.reshape(tiles, tile_r, taps)

    weights = ([wh for wh in p["w_h"] if wh is not None]
               + list(p["w_f"]) + list(p["w_z"]) + list(p["b"]))
    out_pad = p["b"][-1].shape[1]

    kernel = functools.partial(_gather_ray_kernel, n_layers, taps, tile_r,
                               last_op, compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((1, tile_r, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, tile_r, 4), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_r, taps), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)]   # whole table
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, taps, tile_r, out_pad),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, taps, tile_r, out_pad),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((4, tile_r, c_pad), compute_dtype)],
        interpret=interpret,
    )(idx, wgt, zp, table, *weights)
    out = out.reshape(1, tiles, taps, tile_r, out_pad)
    out = out.transpose(0, 1, 3, 2, 4).reshape(1, r_pad, taps, out_pad)
    return out[:, :r, :, :p["out_dim"]]


def apply_gather_xla(packed: dict, feat_map: jax.Array, uv: jax.Array,
                     z: jax.Array, last_op: str,
                     compute_dtype=jnp.bfloat16) -> jax.Array:
    """Identical-math XLA reference (bf16 table, f32 tap combine): the
    gather runs as jnp.take_along_axis, the MLP via apply_ray_xla."""
    from .fused_ray_mlp import apply_ray_xla

    bsz, h, w, c = feat_map.shape
    table = feat_map.reshape(bsz, h * w, c).astype(compute_dtype)
    idx, wgt = _bilinear_taps(uv, h, w)
    taps_rows = jnp.take_along_axis(
        table, idx.reshape(bsz, -1)[..., None], axis=1).reshape(
            bsz, uv.shape[1], 4, c)
    feat = (taps_rows.astype(jnp.float32)
            * wgt[..., None]).sum(axis=2).astype(compute_dtype)
    return apply_ray_xla(packed, feat, z, last_op,
                         compute_dtype=compute_dtype)
