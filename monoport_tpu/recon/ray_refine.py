"""Per-ray depth refinement — the fast real-time surface path.

Motivation (measured, see ops/compaction.py): on v5e every dense op at
257^3 (17M voxels) costs 40-400ms regardless of FLOPs, so a full fine
volume cannot be materialized at 30 FPS on this stack. The renderer only
needs what the reference's forward_vertices extracts anyway: the FIRST
surface crossing along each view ray plus normals (RTL/recon.py:28-89).

Algorithm (new, TPU-native — plays the role of the finest Seg3dLossless
level + forward_vertices, fused):
  1. run the hierarchical evaluator only to a coarse resolution (dense ops
     are 8-64x cheaper at 129^3/65^3);
  2. depth-peel the coarse volume -> per-ray coarse crossing (+- 1 coarse
     voxel);
  3. upsample the (2D) depth/valid maps to the fine ray grid and query the
     occupancy MLP at T fine z-taps bracketing each ray's coarse crossing
     — a single [rays * T] point batch (the hot MLP path, not volume ops);
  4. sub-voxel crossing between the bracketing taps (same interpolation
     form as RTL/recon.py:77); normals from adjacent-tap differences (z)
     and neighbor-ray depth differences (x, y).

Effective depth resolution equals the fine grid (1/256 voxel + sub-voxel
interp) while total work is ~400k MLP points and only 2D map ops.
"""

from __future__ import annotations

import math
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.resize import interpolate_2d
from .depth_peel import SurfaceMaps, depth_peel


def _first_crossing(vals: jax.Array, c_taps: jax.Array,
                    balance_value: float):
    """First iso-crossing along the tap axis: vals/c_taps [..., T] ->
    (z sub-tap crossing depth, hit mask, v1, v2, c1, c2). Tap order is
    increasing c (away from the viewer); the crossing is interpolated
    between the first inside tap and its predecessor (same form as
    RTL/recon.py:77)."""
    taps = vals.shape[-1]
    occ = vals > balance_value
    hit = occ.any(axis=-1)
    first = jnp.argmax(
        occ * jnp.arange(taps, 0, -1, dtype=jnp.int32), axis=-1)
    prev = jnp.maximum(first - 1, 0)
    take = lambda m, i: jnp.take_along_axis(m, i[..., None], axis=-1)[..., 0]
    v1 = take(vals, first)            # inside value
    v2 = take(vals, prev)             # outside value (closer to viewer)
    c1 = take(c_taps, first)
    c2 = take(c_taps, prev)
    denom = v2 - v1
    z = (c2 * (balance_value - v1) + c1 * (v2 - balance_value)) / jnp.where(
        jnp.abs(denom) > 1e-12, denom, 1.0)
    return z, hit, v1, v2, c1, c2


def _refine_core(query_fn: Callable, depth_f: jax.Array, valid_f: jax.Array,
                 ax: jax.Array, by: jax.Array, rf: int, taps: int,
                 scale: float, balance_value: float, b_min, b_max,
                 spacing=(1.0, 1.0), query_taps_fn: Callable | None = None,
                 query_grid_fn: Callable | None = None,
                 compact_budget: int | None = None,
                 telemetry: list | None = None,
                 compact_state: list | None = None):
    """Shared fine pass over an outer-product ray grid.

    depth_f/valid_f: [H, W] upsampled coarse maps for these rays;
    ax/by: [H] / [W] 1D fine ray indices (the grid is their outer product);
    spacing: ray pitch in fine units along each grid axis (>1 when a
    strided window covers a subject larger than the window — normals must
    see the true x/y distance between neighbor rays);
    query_grid_fn: optional grid-structured query (xw [H], yw [W],
    wz [H,W,T] world -> [H,W,T] occupancy) — the gather-free separable-
    sampling fast path (ops/sampling.index_grid);
    query_taps_fn: optional ray-structured query ([1,R,2] xy world +
    [1,R,T] z world -> [1,R,T] occupancy) — the fused gather-once-per-ray
    path (ops/pallas/fused_ray_mlp.py) — else the generic per-point
    ``query_fn`` runs on the flattened [1, R*T, 3] batch.
    compact_budget: query just the coarse-valid rays (padded to this
    static budget) instead of the full lattice — via ``query_taps_fn``
    when given (rotated-frame anchored query: any [1,R,2]+[1,R,T] ray
    batch, no lattice needed) else the per-point ``query_fn``.
    Valid-ray results are identical (their taps are the same points);
    rays the coarse pass already rejected keep the coarse fallback they
    would get anyway when their taps miss. Budget overflow degrades to
    the coarse silhouette for the dropped rays (never holes). The grid
    path ignores this (its lattice must stay an outer product).
    telemetry: optional list; the compact path appends its dropped-ray
    count (valid rays beyond the budget — exactly the rays that degrade
    to the coarse silhouette) as a traced i32 scalar, so overflow is
    observable at runtime instead of silently losing detail (engine
    surfaces it as frame()['compact_dropped']).
    compact_state: optional list; the compact path appends its gathered
    index set + refined per-ray depth so a downstream per-point TEXTURE
    query can ride the SAME compaction instead of re-deriving window,
    valid resample and flatnonzero from the assembled full-grid maps
    (engine._texture_canvas ``reuse`` — the rotated texture stage is
    latency-bound on exactly those small ops, DESIGN.md r4 roofline).
    """
    # fine z taps bracketing the coarse crossing: c in depth-from-viewer
    # units; the crossing lies within +-1 coarse voxel (= scale fine units)
    pad = math.ceil(scale) + 1
    offsets = jnp.linspace(-pad, pad + 1, taps, dtype=jnp.float32)

    b_min = jnp.asarray(b_min, jnp.float32)
    b_max = jnp.asarray(b_max, jnp.float32)
    step = (b_max - b_min) / (rf - 1)
    h, w = depth_f.shape
    xw1 = ax * step[0] + b_min[0]                               # [H]
    yw1 = by * step[1] + b_min[1]                               # [W]

    if compact_budget and query_grid_fn is None:
        return _refine_core_compact(query_fn, depth_f, valid_f, xw1, yw1,
                                    rf, offsets, balance_value, step, b_min,
                                    spacing, compact_budget,
                                    query_taps_fn=query_taps_fn,
                                    telemetry=telemetry,
                                    compact_state=compact_state)

    c_taps = depth_f[..., None] + offsets                       # [H, W, T]
    c_taps = jnp.clip(c_taps, 0.0, rf - 1)
    # vol index i = rf-1-c (depth_peel convention); world from (x, y, i)
    wz = ((rf - 1) - c_taps) * step[2] + b_min[2]               # [H, W, T]
    if query_grid_fn is not None:
        vals = query_grid_fn(xw1, yw1, wz).astype(jnp.float32)
    elif query_taps_fn is not None:
        xy = jnp.stack([jnp.broadcast_to(xw1[:, None], (h, w)),
                        jnp.broadcast_to(yw1[None, :], (h, w))],
                       axis=-1)                                 # [H, W, 2]
        vals = query_taps_fn(xy.reshape(1, -1, 2),
                             wz.reshape(1, -1, taps))
        vals = vals.reshape(h, w, taps).astype(jnp.float32)
    else:
        wx = jnp.broadcast_to(xw1[:, None, None], (h, w, taps))
        wy = jnp.broadcast_to(yw1[None, :, None], (h, w, taps))
        pts = jnp.stack([wx, wy, wz], axis=-1).reshape(1, -1, 3)
        vals = query_fn(pts)[0, :, 0].reshape(h, w, taps).astype(jnp.float32)

    # first tap (smallest c) that is inside the surface
    z, hit, v1, v2, c1, c2 = _first_crossing(vals, c_taps, balance_value)
    z = jnp.clip(z, 0.0, float(rf))
    # rays whose window missed the surface fall back to the coarse depth
    z = jnp.where(hit, z, depth_f)
    # the refined silhouette is the TAP-VERIFIED one: a coarse-valid ray
    # whose fine taps never enter the surface is upsampling halo, not
    # subject (silhouette IOU vs the dense oracle 0.87 -> 0.99 on the
    # thin-limb scene; the reference's silhouette is likewise the fine
    # volume's own support, RTL/recon.py:56-60)
    valid = hit & valid_f
    dvdz = (v1 - v2) / jnp.maximum(c1 - c2, 1e-6)   # occupancy slope along c
    return _normals_from_maps(z, dvdz, v2 - v1, valid, h, w, spacing)


def _normals_from_maps(z, dvdz, nz, valid, h, w, spacing):
    # normals: z-gradient from adjacent taps; x/y from neighbor-ray depth
    # differences (2-sample backward differences like RTL/recon.py:81-87,
    # expressed on the depth field: dv/dx ≈ -dz/dx * dv/dz)
    zpad_a = jnp.pad(z, ((2, 0), (0, 0)), mode="edge")[:h]
    zpad_b = jnp.pad(z, ((0, 0), (2, 0)), mode="edge")[:, :w]
    # v(x-2) - v(x) at fixed c ≈ (z(x-2) - z(x)) * dv/dc  (surface shift)
    norm_x = (z - zpad_a) * dvdz / spacing[0]
    norm_y = (z - zpad_b) * dvdz / spacing[1]
    norm = jnp.stack([norm_x, norm_y, nz], axis=-1)
    norm = norm / jnp.maximum(
        jnp.linalg.norm(norm, axis=-1, keepdims=True), 1e-9)
    return SurfaceMaps(depth=z, normal=norm, valid=valid)


def _refine_core_compact(query_fn: Callable, depth_f, valid_f, xw1, yw1,
                         rf: int, offsets, balance_value: float, step,
                         b_min, spacing, budget: int,
                         query_taps_fn: Callable | None = None,
                         telemetry: list | None = None,
                         compact_state: list | None = None):
    """Compacted fine pass: gather the coarse-valid rays (padded to
    ``budget``), query only their taps, scatter the crossing results
    back onto the full lattice. Rotated-view frames lose the grid
    structure but only ~35-55% of the windowed rays are coarse-valid —
    this trades one small gather/scatter pair for ~45% of the frame's
    dominant MLP+feature-gather cost (r3 rotated ledger). The compacted
    ray batch rides ``query_taps_fn`` when given (the anchored rotated
    query — K feature gathers + shared x-projections per ray instead of
    T full per-point queries) else the per-point ``query_fn``."""
    h, w = depth_f.shape
    n = h * w
    flat_valid = valid_f.reshape(-1)
    dropped = None
    if telemetry is not None or compact_state is not None:
        # valid rays beyond the budget degrade to the coarse silhouette —
        # count them so overflow is observable (engine 'compact_dropped')
        dropped = jnp.maximum(flat_valid.sum(dtype=jnp.int32) - budget, 0)
    if telemetry is not None:
        telemetry.append(dropped)
    idx = jnp.flatnonzero(flat_valid, size=budget, fill_value=n)  # [K]
    sel_ok = idx < n
    safe = jnp.where(sel_ok, idx, 0)
    d_sel = depth_f.reshape(-1)[safe]                            # [K]
    c_taps = jnp.clip(d_sel[:, None] + offsets, 0.0, rf - 1)     # [K, T]
    wz = ((rf - 1) - c_taps) * step[2] + b_min[2]
    wx = xw1[safe // w]
    wy = yw1[safe % w]
    taps = offsets.shape[0]
    if query_taps_fn is not None:
        xy = jnp.stack([wx, wy], axis=-1)[None]                  # [1, K, 2]
        vals = query_taps_fn(xy, wz[None])[0].astype(jnp.float32)
    else:
        pts = jnp.stack([jnp.broadcast_to(wx[:, None], (budget, taps)),
                         jnp.broadcast_to(wy[:, None], (budget, taps)), wz],
                        axis=-1).reshape(1, -1, 3)
        vals = query_fn(pts)[0, :, 0].reshape(budget,
                                              taps).astype(jnp.float32)

    z, hit, v1, v2, c1, c2 = _first_crossing(vals, c_taps, balance_value)
    z = jnp.where(hit, jnp.clip(z, 0.0, float(rf)), d_sel)
    dvdz = (v1 - v2) / jnp.maximum(c1 - c2, 1e-6)
    if compact_state is not None:
        # hand the gathered index set + refined per-ray depth to a
        # downstream texture query (engine._texture_canvas reuse): the
        # texture's window/valid/flatnonzero would re-derive exactly this
        compact_state.append({"idx": idx, "safe": safe, "z": z,
                              "dropped": dropped})

    # scatter back (mode='drop' ignores the fill rows); unqueried rays
    # keep the coarse depth / a viewer-facing normal, and — on budget
    # overflow only — the coarse silhouette instead of a hole
    scat = lambda init, upd: init.reshape(-1).at[idx].set(
        upd, mode="drop").reshape(h, w)
    z_full = scat(depth_f, z)
    hit_full = scat(jnp.zeros((h, w), bool), hit)
    queried = scat(jnp.zeros((h, w), bool), sel_ok)
    dvdz_full = scat(jnp.zeros((h, w), jnp.float32), dvdz)
    nz_full = scat(jnp.full((h, w), -1.0, jnp.float32), v2 - v1)
    valid = jnp.where(queried, hit_full, valid_f) & valid_f
    return _normals_from_maps(z_full, dvdz_full, nz_full, valid, h, w,
                              spacing)


def _upsampled_coarse(coarse: SurfaceMaps, rf: int, scale: float):
    # Valid-WEIGHTED bilinear upsample of the coarse depth: invalid coarse
    # pixels (NaN at degenerate iso-crossings, RTL/recon.py:77 parity
    # quirk, or simply background) contribute zero weight instead of a
    # zero depth. A plain bilinear upsample drags silhouette-edge depths
    # toward the viewer plane, which throws the fine z-taps off the
    # surface: measured on the thin-limb scene (DESIGN.md quality table),
    # tap hit-rate at true silhouette pixels goes 89.5% -> 99.1% with the
    # weighted form.
    v = coarse.valid.astype(jnp.float32)
    d = jnp.nan_to_num(coarse.depth, nan=0.0) * v
    up = lambda img: interpolate_2d(img[None, ..., None], (rf, rf),
                                    "bilinear")[0, ..., 0]
    wsum = up(v)
    depth_f = jnp.where(wsum > 1e-6,
                        up(d) / jnp.maximum(wsum, 1e-6), 0.0) * scale
    valid_f = wsum > 0.0
    return depth_f, valid_f


def ray_refine(query_fn: Callable, vol_coarse: jax.Array, fine_res: int,
               taps: int = 6, balance_value: float = 0.5,
               b_min=(-1.0, -1.0, -1.0), b_max=(1.0, 1.0, 1.0),
               direction: str = "front",
               window: int | None = None,
               query_taps_fn: Callable | None = None,
               query_grid_fn: Callable | None = None) -> SurfaceMaps:
    """-> SurfaceMaps at ``fine_res`` ray resolution (depth in fine voxel
    units along the viewing axis, matching depth_peel's convention).

    ``window``: optionally refine only a window x window ray block placed
    over the subject's bbox (computed from the coarse valid mask) — the
    fine-pass analog of the reference's detection-region prior
    (RTL/main.py:290). Rays outside the window keep the upsampled coarse
    surface. Static shape, dynamic position.
    """
    coarse = depth_peel(vol_coarse, direction, balance_value)
    return refine_from_maps(query_fn, coarse, vol_coarse.shape[0], fine_res,
                            taps=taps, balance_value=balance_value,
                            b_min=b_min, b_max=b_max, window=window,
                            query_taps_fn=query_taps_fn,
                            query_grid_fn=query_grid_fn)


def _compact_rays(compact: float | None, h: int, w: int) -> int | None:
    """Ray budget for the compacted per-point fine pass: ``compact`` x the
    lattice size, rounded up to a 256 multiple (None/1.0 -> dense)."""
    if not compact or compact >= 1.0:
        return None
    return min(-(-int(h * w * compact) // 256) * 256, h * w)


def refine_from_maps(query_fn: Callable, coarse: SurfaceMaps, rc: int,
                     fine_res: int, taps: int = 6,
                     balance_value: float = 0.5,
                     b_min=(-1.0, -1.0, -1.0), b_max=(1.0, 1.0, 1.0),
                     window: int | None = None,
                     query_taps_fn: Callable | None = None,
                     query_grid_fn: Callable | None = None,
                     compact: float | None = None,
                     telemetry: list | None = None,
                     compact_state: list | None = None) -> SurfaceMaps:
    """Fine pass from coarse per-ray maps (rc^2 grid, depth in rc-voxel
    units) instead of a coarse volume — the shared tail of ``ray_refine``
    and the volume-free ``ray_pyramid``.

    ``compact``: non-grid paths — query just the coarse-valid rays,
    padded to a static budget of this fraction of the lattice
    (_refine_core_compact; the rotated-view cost lever).
    ``telemetry``: see ``_refine_core`` — collects compact dropped-ray
    counts.
    ``compact_state``: windowed compact path only — appends a dict with
    the window geometry (x0/sx/y0/sy, aw/bw fine-unit axes, w) plus the
    core's gathered indices and refined per-ray depth, so the texture
    query can reuse this level's compaction (engine._texture_canvas)."""
    rf = fine_res
    scale = (rf - 1) / (rc - 1)
    depth_f, valid_f = _upsampled_coarse(coarse, rf, scale)

    if window is None or window >= rf:
        a = jnp.arange(rf, dtype=jnp.float32)
        return _refine_core(query_fn, depth_f, valid_f, a, a, rf, taps,
                            scale, balance_value, b_min, b_max,
                            query_taps_fn=query_taps_fn,
                            query_grid_fn=query_grid_fn,
                            compact_budget=_compact_rays(compact, rf, rf),
                            telemetry=telemetry)

    # --- adaptive windowed fine pass ---
    # window x window rays are spread over the subject's bbox (from the
    # coarse valid mask) at stride >= 1: a subject larger than the window
    # gets proportionally lower ray density over its FULL extent instead of
    # a hard quality cliff at the window border (the reference refines the
    # whole 257^3 volume without any window, RTL/main.py:390-395).
    x0, sx_stride = _axis_window(coarse.valid.any(axis=1), rc, rf, scale,
                                 window)
    y0, sy_stride = _axis_window(coarse.valid.any(axis=0), rc, rf, scale,
                                 window)
    aw = x0 + jnp.arange(window, dtype=jnp.float32) * sx_stride
    bw = y0 + jnp.arange(window, dtype=jnp.float32) * sy_stride
    d_w = _sample_grid(depth_f, aw, bw)
    v_w = _sample_grid(valid_f.astype(jnp.float32), aw, bw) > 0.0
    core_state: list | None = [] if compact_state is not None else None
    maps_w = _refine_core(query_fn, d_w, v_w, aw, bw, rf, taps, scale,
                          balance_value, b_min, b_max,
                          spacing=(sx_stride, sy_stride),
                          query_taps_fn=query_taps_fn,
                          query_grid_fn=query_grid_fn,
                          compact_budget=_compact_rays(compact, window,
                                                       window),
                          telemetry=telemetry,
                          compact_state=core_state)
    if core_state:
        compact_state.append({**core_state[0], "w": window,
                              "x0": x0, "sx": sx_stride,
                              "y0": y0, "sy": sy_stride,
                              "aw": aw, "bw": bw})

    # resample the refined window back onto the full fine grid (exact
    # gather when stride == 1); outside the window keep the coarse maps
    u = (jnp.arange(rf, dtype=jnp.float32) - x0) / sx_stride
    v = (jnp.arange(rf, dtype=jnp.float32) - y0) / sy_stride
    inside = ((u >= 0) & (u <= window - 1))[:, None] & \
             ((v >= 0) & (v <= window - 1))[None, :]
    uc = jnp.clip(u, 0.0, window - 1)
    vc = jnp.clip(v, 0.0, window - 1)
    depth = jnp.where(inside, _sample_grid(maps_w.depth, uc, vc), depth_f)
    norm_fallback = jnp.zeros((rf, rf, 3), jnp.float32).at[..., 2].set(-1.0)
    norm_w = jnp.stack([_sample_grid(maps_w.normal[..., k], uc, vc)
                        for k in range(3)], axis=-1)
    norm_w = norm_w / jnp.maximum(
        jnp.linalg.norm(norm_w, axis=-1, keepdims=True), 1e-9)
    norm = jnp.where(inside[..., None], norm_w, norm_fallback)
    # inside the window the silhouette is the tap-verified one (exact
    # gather at stride 1); outside it stays the coarse upsample
    valid_w = _sample_grid(maps_w.valid.astype(jnp.float32), uc, vc) > 0.5
    valid = jnp.where(inside, valid_w, valid_f)
    return SurfaceMaps(depth=depth, normal=norm, valid=valid)


def _axis_window(any_valid: jax.Array, rc: int, rf: int, scale: float,
                 window: int):
    """Start (fine units, snapped to the stride lattice) and stride for one
    window axis, covering the subject's coarse-valid extent with margin."""
    idx = jnp.arange(rc, dtype=jnp.float32)
    big = jnp.float32(rc)
    lo = jnp.min(jnp.where(any_valid, idx, big))
    hi = jnp.max(jnp.where(any_valid, idx, -1.0))
    has = hi >= lo
    lo = jnp.where(has, lo, 0.0)
    hi = jnp.where(has, hi, rc - 1.0)
    margin = 1.5 * scale  # the crossing can sit +-1 coarse voxel out
    f_lo = jnp.maximum(lo * scale - margin, 0.0)
    f_hi = jnp.minimum(hi * scale + margin, rf - 1.0)
    stride = jnp.maximum((f_hi - f_lo) / (window - 1), 1.0)
    center = (f_lo + f_hi) * 0.5
    start = center - stride * (window - 1) * 0.5
    start = jnp.clip(start, 0.0, rf - 1 - stride * (window - 1))
    # integer start when unstrided keeps the fit-in-window path an exact
    # gather (and bit-equal to the unwindowed pass over the subject)
    start = jnp.where(stride <= 1.0, jnp.round(start), start)
    return start, stride


def ray_march(query_fn: Callable, res: int, balance_value: float = 0.5,
              b_min=(-1.0, -1.0, -1.0), b_max=(1.0, 1.0, 1.0),
              query_taps_fn: Callable | None = None,
              query_grid_fn: Callable | None = None) -> SurfaceMaps:
    """Dense first-crossing march: res^2 frontal rays x res z-taps (the
    full coarse lattice) -> SurfaceMaps with depth in res-voxel units.

    This is the volume-free replacement for the coarse hierarchy +
    depth_peel pair on the real-time path: its crossing equals the dense
    res^3 depth peel EXACTLY (same lattice, same interpolation), but no 3D
    volume, band compaction or write-back is ever materialized — on TPU
    those layout ops cost more than the extra MLP taps (measured r3 stage
    ledger: 12.0 ms hierarchy vs ~3 ms of equivalent ray-kernel taps;
    DESIGN.md). Frontal ("front" direction) only, like the ray-structured
    query it feeds (monoport_net.py:110-112).
    """
    b_min = jnp.asarray(b_min, jnp.float32)
    b_max = jnp.asarray(b_max, jnp.float32)
    step = (b_max - b_min) / (res - 1)
    a = jnp.arange(res, dtype=jnp.float32)
    c_taps = jnp.broadcast_to(a, (res, res, res))            # [R, R, T]
    wz = ((res - 1) - c_taps) * step[2] + b_min[2]
    xw1 = a * step[0] + b_min[0]
    yw1 = a * step[1] + b_min[1]
    if query_grid_fn is not None:
        vals = query_grid_fn(xw1, yw1, wz).astype(jnp.float32)
    elif query_taps_fn is not None:
        xy = jnp.stack([jnp.broadcast_to(xw1[:, None], (res, res)),
                        jnp.broadcast_to(yw1[None, :], (res, res))],
                       axis=-1)
        vals = query_taps_fn(xy.reshape(1, -1, 2), wz.reshape(1, -1, res))
        vals = vals.reshape(res, res, res).astype(jnp.float32)
    else:
        wx = jnp.broadcast_to(xw1[:, None, None], (res, res, res))
        wy = jnp.broadcast_to(yw1[None, :, None], (res, res, res))
        pts = jnp.stack([wx, wy, wz], axis=-1).reshape(1, -1, 3)
        vals = query_fn(pts)[0, :, 0].reshape(res, res, res).astype(
            jnp.float32)
    z, hit, v1, v2, c1, c2 = _first_crossing(vals, c_taps, balance_value)
    z = jnp.where(hit, jnp.clip(z, 0.0, float(res)), 0.0)
    # normals are not needed at coarse levels (the fine pass recomputes
    # them); keep the -z viewer-facing placeholder
    norm = jnp.zeros((res, res, 3), jnp.float32).at[..., 2].set(-1.0)
    return SurfaceMaps(depth=z, normal=norm, valid=hit)


def ray_pyramid(query_fn: Callable, fine_res: int, levels=(33, 65),
                taps: int = 6, balance_value: float = 0.5,
                b_min=(-1.0, -1.0, -1.0), b_max=(1.0, 1.0, 1.0),
                window: int | None = None,
                query_taps_fn: Callable | None = None,
                query_grid_fn: Callable | None = None,
                compact: float | None = None,
                march_taps: bool = True,
                telemetry: list | None = None,
                compact_state: list | None = None) -> SurfaceMaps:
    """Volume-free coarse-to-fine surface localization, all per-ray:
    dense march at levels[0], then successive ``refine_from_maps`` passes
    through the remaining levels and finally ``fine_res`` (with the
    optional bbox window). Plays the role of hierarchy + depth_peel +
    ray_refine on the frontal real-time path with zero 3D volume ops.
    ``compact``: non-grid paths — each refine level queries just its
    coarse-valid rays at this budget fraction (the rotated-view lever).
    ``march_taps``: give the dense march ``query_taps_fn`` too. False for
    the rotated anchored query, whose feature lerp is only accurate over
    the refine levels' short tap spans — the march's full-volume rays
    fall back to the exact per-point ``query_fn``.
    ``query_taps_fn`` may also be a SEQUENCE of one fn (or None) per
    refine level (len(levels) entries: levels[0]->levels[1], ...,
    levels[-1]->fine_res) — the rotated anchored query picks its anchor
    count per level from that level's uv tap span (engine.
    _rot_anchor_plan), so coarser levels (longer spans) can run exact
    per-point while the fine level rides the lerp."""
    per_level = isinstance(query_taps_fn, (list, tuple))
    if per_level:
        assert not march_taps, \
            "per-level taps fns are refine-only (march has no entry)"
        assert len(query_taps_fn) == len(levels), \
            (len(query_taps_fn), len(levels))
        fns = list(query_taps_fn)
    else:
        fns = [query_taps_fn] * len(levels)
    maps = ray_march(query_fn, levels[0], balance_value, b_min, b_max,
                     query_taps_fn=fns[0] if march_taps else None,
                     query_grid_fn=query_grid_fn)
    for i, (rc, rl) in enumerate(zip(levels[:-1], levels[1:])):
        maps = refine_from_maps(query_fn, maps, rc, rl, taps=taps,
                                balance_value=balance_value,
                                b_min=b_min, b_max=b_max,
                                query_taps_fn=fns[i],
                                query_grid_fn=query_grid_fn,
                                compact=compact, telemetry=telemetry)
    return refine_from_maps(query_fn, maps, levels[-1], fine_res,
                            taps=taps, balance_value=balance_value,
                            b_min=b_min, b_max=b_max, window=window,
                            query_taps_fn=fns[-1],
                            query_grid_fn=query_grid_fn, compact=compact,
                            telemetry=telemetry,
                            compact_state=compact_state)


def _sample_grid(img: jax.Array, xi: jax.Array, yi: jax.Array) -> jax.Array:
    """Separable bilinear sample of img [H, W] at the outer-product grid
    xi [h] x yi [w] (float indices, assumed in-range) -> [h, w]."""
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(xi).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, h - 1)
    fx = jnp.clip(xi - x0, 0.0, 1.0)
    rows = img[x0] * (1.0 - fx)[:, None] + img[x1] * fx[:, None]   # [h, W]
    y0 = jnp.clip(jnp.floor(yi).astype(jnp.int32), 0, w - 1)
    y1 = jnp.minimum(y0 + 1, w - 1)
    fy = jnp.clip(yi - y0, 0.0, 1.0)
    return rows[:, y0] * (1.0 - fy)[None, :] + rows[:, y1] * fy[None, :]
