"""Pallas TPU kernel: ray-structured fused sample+MLP for the fine pass.

The fine refinement (recon/ray_refine.py) evaluates T z-taps per view ray.
Under the flagship calibration (RTL/recon.py:5-25 pifu_calib — orthographic,
no z term in the image-plane rows) every tap of a ray projects to the SAME
(u, v), so per ray:

  * the 4-tap bilinear feature gather (geometry.py:4-16) happens ONCE, not
    T times — 1/T the gather traffic of the generic per-point path;
  * the skip-concat MLP input x = [feat(C); z(1)] differs between taps only
    in the scalar z, so every layer's x-contribution splits as
        W_x x = W_f feat + z * w_z
    where W_f feat is computed once per ray and z * w_z is a rank-1
    broadcast per tap. For the netG head ([257,1024,512,256,128,1],
    SurfaceClassifier.py:74-79) the shared projections are ~42% of the MLP
    MACs; at T=6 taps the per-point cost drops ~35%.

Kernel: ray tiles stream through the grid; ALL weights + the per-layer
shared projections live in VMEM; taps unroll statically. bf16 MXU compute,
f32 accumulation (same arithmetic as ops/pallas/fused_mlp.py, which
remains the generic any-point-batch kernel).

``apply_ray_xla`` is the identical-math XLA fallback (CPU tests, and the
non-Pallas engine path still beats the naive per-point query by sharing
the gather and x-projections).
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


def infer_head_channels(head_params: dict) -> tuple[int, ...]:
    """Recover the effective filter_channels from SurfaceClassifier params
    (flax Dense infers input widths, so a small-backbone config's head has
    a different input dim than the PIFu factory spec)."""
    n = len(head_params)
    outs = [head_params[f"filters_{i}"]["kernel"].shape[1] for i in range(n)]
    return (head_params["filters_0"]["kernel"].shape[0], *outs)


def pack_ray_mlp_params(head_params: dict,
                        filter_channels: Sequence[int] | None = None,
                        dtype=jnp.bfloat16):
    """Split SurfaceClassifier params for the ray kernel.

    The head input is [feat(C_f); z(1)] with z as the LAST channel
    (MonoPortNet.query concat order, monoport_net.py:89). Returns per layer
    i in 0..L-1:
      w_h[i] [H_pad,   O_pad]  hidden-path weights (None for layer 0);
      w_f[i] [C_f_pad, O_pad]  feat rows of the skip/input weights;
      w_z[i] [1,       O_pad]  the z row (f32);
      b[i]   [1,       O_pad]  bias (f32).
    """
    chans = list(filter_channels or infer_head_channels(head_params))
    c_in = chans[0]
    c_f = c_in - 1
    c_f_pad = _round_up(c_f, 128)
    w_h, w_f, w_z, b = [], [], [], []
    for i in range(len(chans) - 1):
        kernel = jnp.asarray(head_params[f"filters_{i}"]["kernel"])
        bias = jnp.asarray(head_params[f"filters_{i}"]["bias"])
        out_dim = chans[i + 1]
        out_pad = _round_up(out_dim, 128)
        if i == 0:
            assert kernel.shape == (c_in, out_dim)
            x_rows = kernel
            wh = None
        else:
            h_dim = chans[i]
            h_pad = _round_up(h_dim, 128)
            assert kernel.shape == (h_dim + c_in, out_dim)
            wh = jnp.zeros((h_pad, out_pad), dtype).at[
                :h_dim, :out_dim].set(kernel[:h_dim].astype(dtype))
            x_rows = kernel[h_dim:]
        wf = jnp.zeros((c_f_pad, out_pad), dtype).at[
            :c_f, :out_dim].set(x_rows[:c_f].astype(dtype))
        wz = jnp.zeros((1, out_pad), jnp.float32).at[
            0, :out_dim].set(x_rows[c_f].astype(jnp.float32))
        bb = jnp.zeros((1, out_pad), jnp.float32).at[0, :out_dim].set(bias)
        w_h.append(wh)
        w_f.append(wf)
        w_z.append(wz)
        b.append(bb)
    return {"w_h": w_h, "w_f": w_f, "w_z": w_z, "b": b,
            "c_f": c_f, "c_f_pad": c_f_pad, "out_dim": chans[-1]}


def _activate(acc, i, n_layers, last_op):
    if i != n_layers - 1:
        return jnp.where(acc > 0, acc, acc * 0.01)  # leaky_relu(0.01)
    if last_op == "sigmoid":
        return jax.nn.sigmoid(acc)
    if last_op == "tanh":
        return jnp.tanh(acc)
    return acc


def _ray_kernel(n_layers: int, taps: int, last_op: str, compute_dtype,
                feat_ref, z_ref, *refs):
    """refs = [w_h1..w_h(L-1), w_f0..w_f(L-1), w_z0.., b0.., out_ref]."""
    w_h = refs[:n_layers - 1]
    w_f = refs[n_layers - 1:2 * n_layers - 1]
    w_z = refs[2 * n_layers - 1:3 * n_layers - 1]
    b = refs[3 * n_layers - 1:4 * n_layers - 1]
    out_ref = refs[-1]

    feat = feat_ref[0]                                   # [R, C_f]
    # shared per-ray projections: computed once, reused by every tap
    xproj = [jnp.dot(feat, w_f[i][...], preferred_element_type=jnp.float32)
             for i in range(n_layers)]
    for t in range(taps):                                # static unroll
        zt = z_ref[0, :, t][:, None].astype(jnp.float32)  # [R, 1]
        h = None
        for i in range(n_layers):
            acc = xproj[i] + zt * w_z[i][...] + b[i][...]
            if i > 0:
                acc = acc + jnp.dot(h, w_h[i - 1][...],
                                    preferred_element_type=jnp.float32)
            acc = _activate(acc, i, n_layers, last_op)
            h = acc.astype(compute_dtype)
        out_ref[0, t] = acc.astype(out_ref.dtype)


def apply_ray_packed(packed: dict, feat: jax.Array, z: jax.Array,
                     last_op: str, tile_r: int = 256,
                     compute_dtype=jnp.bfloat16,
                     interpret: bool = False) -> jax.Array:
    """[B, R, C_f] feats + [B, R, T] z-features -> [B, R, T, out_dim]."""
    p = packed
    bsz, r, c = feat.shape
    taps = z.shape[-1]
    assert c == p["c_f"], (c, p["c_f"])
    c = p["c_f_pad"]  # zero-pad feat columns to the lane boundary
    n_layers = len(p["w_f"])
    r_pad = _round_up(r, tile_r)
    fp = jnp.zeros((bsz, r_pad, c), compute_dtype).at[
        :, :r, :p["c_f"]].set(feat.astype(compute_dtype))
    zp = jnp.zeros((bsz, r_pad, taps), jnp.float32).at[:, :r].set(
        z.astype(jnp.float32))
    tiles = bsz * (r_pad // tile_r)
    fp = fp.reshape(tiles, tile_r, c)
    zp = zp.reshape(tiles, tile_r, taps)

    weights = ([w for w in p["w_h"] if w is not None]
               + list(p["w_f"]) + list(p["w_z"]) + list(p["b"]))
    out_pad = p["b"][-1].shape[1]

    kernel = functools.partial(_ray_kernel, n_layers, taps, last_op,
                               compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec((1, tile_r, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, tile_r, taps), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, taps, tile_r, out_pad),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, taps, tile_r, out_pad),
                                       jnp.float32),
        interpret=interpret,
    )(fp, zp, *weights)
    out = out.reshape(bsz, r_pad // tile_r, taps, tile_r, out_pad)
    out = out.transpose(0, 1, 3, 2, 4).reshape(bsz, r_pad, taps, out_pad)
    return out[:, :r, :, :p["out_dim"]]


def _anchor_kernel(n_layers: int, n_anchors: int, last_op: str,
                   compute_dtype, feat_ref, mix_ref, *refs):
    """Anchored variant of ``_ray_kernel``: the per-ray feature is not
    shared across taps (rotated calibs move (u, v) along the ray), but it
    IS a per-tap convex combination of ``n_anchors`` per-ray anchor
    features (uv is LINEAR in z under any affine calib, so anchor features
    + piecewise-lerp reconstruct the moving sample). Each anchor's skip
    x-projections are computed once per ray; every tap combines them with
    its two hat weights — restoring the shared-projection/gather savings
    the frontal taps kernel gets, at K/T of the dense cost.

    Grid is (ray tiles, taps) — ONE tap per grid step. Mosaic's stack
    allocator gives every SSA temporary of a statically-unrolled body its
    own scoped-VMEM slot, so unrolling taps x layers x anchors blew the
    16 MB budget at the production head no matter the ordering (64.76M
    tap-outer, 32.91M layer-outer, 69.38M with explicit reused scratch —
    scripts/probe_anchor_kernel.py). With taps on the grid the emitted
    body is one tap's five layers; the K per-anchor projections are
    computed once per ray tile at the first tap step into per-layer
    scratch (TPU grids run sequentially, minor-axis innermost, and
    scratch persists across steps) and reused by the remaining taps.

    feat_ref [1, K, R, C_f]; mix_ref [1, 1, R, 8] (this tap's K hat
    weights in lanes 0..K-1 and its z in lane K — packed 8-wide so the
    per-tap block spans full minor dims, the Mosaic block-shape rule);
    refs = weights as in ``_ray_kernel`` + out_ref [1, 1, R, out_pad] +
    n_layers scratch buffers xp[i] [K, R, O_i] f32."""
    w_h = refs[:n_layers - 1]
    w_f = refs[n_layers - 1:2 * n_layers - 1]
    w_z = refs[2 * n_layers - 1:3 * n_layers - 1]
    b = refs[3 * n_layers - 1:4 * n_layers - 1]
    out_ref = refs[4 * n_layers - 1]
    xp = refs[4 * n_layers:]                # n_layers x [K, R, O_i] f32

    @pl.when(pl.program_id(1) == 0)
    def _project_anchors():
        for i in range(n_layers):
            for k in range(n_anchors):
                xp[i][k] = jnp.dot(feat_ref[0, k], w_f[i][...],
                                   preferred_element_type=jnp.float32)

    mix = mix_ref[0, 0]                                        # [R, 8]
    zt = mix[:, n_anchors][:, None]                            # [R, 1]
    wks = [mix[:, k][:, None] for k in range(n_anchors)]       # K x [R, 1]
    h = None
    for i in range(n_layers):
        acc = zt * w_z[i][...] + b[i][...]
        for k in range(n_anchors):
            acc = acc + wks[k] * xp[i][k]
        if i > 0:
            acc = acc + jnp.dot(h, w_h[i - 1][...],
                                preferred_element_type=jnp.float32)
        acc = _activate(acc, i, n_layers, last_op)
        h = acc.astype(compute_dtype)
    out_ref[0, 0] = acc.astype(out_ref.dtype)


def apply_anchor_packed(packed: dict, feat_anchors: jax.Array,
                        w_taps: jax.Array, z: jax.Array, last_op: str,
                        tile_r: int = 256, compute_dtype=jnp.bfloat16,
                        interpret: bool = False) -> jax.Array:
    """[B, R, K, C_f] anchor feats + [B, R, T, K] per-tap hat weights +
    [B, R, T] z-features -> [B, R, T, out_dim].

    tile_r=256 measured fastest at the production rotated-frame shape
    (23040 rays, K=3, T=6): 2.15 ms vs 2.80/3.15/4.45 at 128/64/32 and
    3.52 ms for the per-point fused head it replaces, same session
    (scripts/probe_anchor_kernel.py)."""
    p = packed
    bsz, r, n_anchors, c = feat_anchors.shape
    taps = z.shape[-1]
    assert c == p["c_f"], (c, p["c_f"])
    assert w_taps.shape == (bsz, r, taps, n_anchors)
    c = p["c_f_pad"]
    n_layers = len(p["w_f"])
    r_pad = _round_up(r, tile_r)
    fp = jnp.zeros((bsz, r_pad, n_anchors, c), compute_dtype).at[
        :, :r, :, :p["c_f"]].set(feat_anchors.astype(compute_dtype))
    fp = fp.transpose(0, 2, 1, 3)                  # [B, K, R_pad, C]
    # "mix" tensor: K hat weights + z per (ray, tap), 8 lanes wide so each
    # per-tap block spans full minor dims (Mosaic block-shape rule)
    assert n_anchors + 1 <= 8, n_anchors
    mix = jnp.zeros((bsz, r_pad, taps, 8), jnp.float32)
    mix = mix.at[:, :r, :, :n_anchors].set(w_taps.astype(jnp.float32))
    mix = mix.at[:, :r, :, n_anchors].set(z.astype(jnp.float32))
    tiles = bsz * (r_pad // tile_r)
    fp = fp.reshape(bsz, n_anchors, r_pad // tile_r, tile_r, c).transpose(
        0, 2, 1, 3, 4).reshape(tiles, n_anchors, tile_r, c)
    mix = mix.reshape(tiles, tile_r, taps, 8).transpose(0, 2, 1, 3) \
        .reshape(tiles, taps, tile_r, 8)

    weights = ([w for w in p["w_h"] if w is not None]
               + list(p["w_f"]) + list(p["w_z"]) + list(p["b"]))
    out_pad = p["b"][-1].shape[1]
    # padded output width per layer (scratch sizing)
    o_widths = tuple(bb.shape[1] for bb in p["b"])

    kernel = functools.partial(_anchor_kernel, n_layers, n_anchors,
                               last_op, compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(tiles, taps),
        in_specs=[pl.BlockSpec((1, n_anchors, tile_r, c),
                               lambda i, t: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, tile_r, 8), lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in weights],
        out_specs=pl.BlockSpec((1, 1, tile_r, out_pad),
                               lambda i, t: (i, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles, taps, tile_r, out_pad),
                                       jnp.float32),
        scratch_shapes=[pltpu.VMEM((n_anchors, tile_r, o), jnp.float32)
                        for o in o_widths],
        interpret=interpret,
    )(fp, mix, *weights)
    out = out.reshape(bsz, r_pad // tile_r, taps, tile_r, out_pad)
    out = out.transpose(0, 1, 3, 2, 4).reshape(bsz, r_pad, taps, out_pad)
    return out[:, :r, :, :p["out_dim"]]


def apply_anchor_xla(packed: dict, feat_anchors: jax.Array,
                     w_taps: jax.Array, z: jax.Array, last_op: str,
                     compute_dtype=jnp.bfloat16) -> jax.Array:
    """Identical math to ``apply_anchor_packed`` in plain XLA (CPU tests /
    non-Pallas engines). feat_anchors [B,R,K,C_f], w_taps [B,R,T,K],
    z [B,R,T] -> [B,R,T,out_dim]."""
    p = packed
    n_layers = len(p["w_f"])
    if feat_anchors.shape[-1] < p["c_f_pad"]:
        feat_anchors = jnp.pad(
            feat_anchors, ((0, 0),) * (feat_anchors.ndim - 1)
            + ((0, p["c_f_pad"] - feat_anchors.shape[-1]),))
    f = feat_anchors.astype(compute_dtype)
    # per-anchor shared projections, combined per tap by the hat weights
    xproj = [jnp.einsum("brkc,co->brko", f,
                        p["w_f"][i]).astype(jnp.float32)
             for i in range(n_layers)]
    w = w_taps.astype(jnp.float32)                       # [B, R, T, K]
    zt = z.astype(jnp.float32)[..., None]                # [B, R, T, 1]
    h = None
    for i in range(n_layers):
        acc = (jnp.einsum("brtk,brko->brto", w, xproj[i])
               + zt * p["w_z"][i][0] + p["b"][i][0])     # [B, R, T, O]
        if i > 0:
            acc = acc + jnp.einsum(
                "brth,ho->brto", h, p["w_h"][i]).astype(jnp.float32)
        acc = _activate(acc, i, n_layers, last_op)
        h = acc.astype(compute_dtype)
    return acc[..., :p["out_dim"]]


def apply_ray_xla(packed: dict, feat: jax.Array, z: jax.Array,
                  last_op: str, compute_dtype=jnp.bfloat16) -> jax.Array:
    """Identical math to the kernel in plain XLA (fallback / CPU tests).

    Still shares the per-ray x-projections across taps — the algorithmic
    win survives without Pallas; the kernel additionally keeps the
    activations VMEM-resident.
    """
    p = packed
    n_layers = len(p["w_f"])
    taps = z.shape[-1]
    if feat.shape[-1] < p["c_f_pad"]:
        feat = jnp.pad(feat, ((0, 0),) * (feat.ndim - 1)
                       + ((0, p["c_f_pad"] - feat.shape[-1]),))
    f = feat.astype(compute_dtype)
    xproj = [jnp.einsum("brc,co->bro", f, p["w_f"][i]).astype(jnp.float32)
             for i in range(n_layers)]
    zt = z.astype(jnp.float32)[..., None]                # [B, R, T, 1]
    h = None
    for i in range(n_layers):
        acc = (xproj[i][:, :, None] + zt * p["w_z"][i][0]
               + p["b"][i][0])                           # [B, R, T, O]
        if i > 0:
            acc = acc + jnp.einsum(
                "brth,ho->brto", h, p["w_h"][i]).astype(jnp.float32)
        acc = _activate(acc, i, n_layers, last_op)
        h = acc.astype(compute_dtype)
    return acc[..., :p["out_dim"]]
