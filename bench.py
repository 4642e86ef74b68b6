"""End-to-end benchmark: full-frame volumetric capture on one chip.

Measures the flagship real-time path (BASELINE.json: "end-to-end recon FPS
at 256^3"): netG hourglass filter on a 512x512 frame -> hierarchical
occupancy to 129^3 -> per-ray fine refinement at 257-equivalent depth
resolution (recon/ray_refine.py) -> normal shading -> netC texture query ->
256^2 render maps, all as ONE jitted program in bf16 (fp32 coordinate and
iso-crossing math).

No pretrained checkpoints are reachable here (zero egress), so weights are
random; to keep refinement-band sizes realistic (a human-scale surface,
not a degenerate random field) the benchmarked query runs the REAL netG
sampling+MLP compute and then selects an analytic ellipsoid occupancy via
jnp.where — identical FLOPs and memory traffic, representative sparsity.

Timing: the tunneled axon backend neither blocks on block_until_ready nor
dispatches un-jitted ops cheaply, so K frames run on-device inside one
lax.fori_loop chained by a data dependency, materialized by one scalar
fetch. The reported rate is the MARGINAL rate between a K-frame and a
2K-frame invocation (medians of 5 reps each), which cancels every fixed
per-invocation cost — fetch RTT, dispatch, relay overhead — by
construction (see measure_fps).

Prints ONE JSON line; vs_baseline = FPS / 30 (the north-star target).
"""

import functools
import json
import os
import time

import numpy as np

# process-start reference: BENCH_BUDGET_S bounds the WHOLE run (the core
# section's relay compiles count against the driver's timeout too), so the
# section budget is whatever the core left over
_T0 = time.monotonic()

import jax
import jax.numpy as jnp

# Persistent compilation cache: the tunneled remote-compile relay costs
# 3-10 min per big program (DESIGN.md); warming this cache once makes
# subsequent bench runs start in seconds (verified to serialize the full
# fused frame program on this backend).
from monoport_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

# experiment knobs (official bench = defaults):
#   BENCH_RAY_QUERY=0     disable the ray-structured fused kernel (A/B)
#   BENCH_BF16_FEATS=1    skip the f32-feature-map workaround (engine.
#                         _feats_f32) — probes the TPU backend bug with the
#                         6x-smaller gather batch of the ray path
#   BENCH_RAY_TAPS / BENCH_RAY_WINDOW   operating-point sweep (defaults
#                         = the shipped profile; quality for candidate
#                         points is measured by the CPU sweep in
#                         tests/test_recon_quality.py / DESIGN.md)
#   BENCH_MARCH=0         disable the volume-free ray-march pyramid and
#                         run the coarse hierarchy instead (the r2 path)
#   BENCH_MARCH_ROTATED=0 rotated view calibs fall back to the hierarchy
#                         path instead of the per-point march (A/B for the
#                         free-viewpoint bench section)
#   BENCH_ROT_ANCHORS     rotated refine anchor mode: "auto" (default,
#                         per-level K from the calib), an int (pinned K),
#                         or "0" (exact per-point refines — the r3 path)
_RAY_QUERY = os.environ.get("BENCH_RAY_QUERY", "1") == "1"
_BF16_FEATS = os.environ.get("BENCH_BF16_FEATS", "0") == "1"
_RAY_TAPS = int(os.environ.get("BENCH_RAY_TAPS", "6"))
_RAY_WINDOW = int(os.environ.get("BENCH_RAY_WINDOW", "192"))
_MARCH = os.environ.get("BENCH_MARCH", "1") == "1" and _RAY_QUERY
_MARCH_LEVELS = (33, 65)
_MARCH_ROTATED = os.environ.get("BENCH_MARCH_ROTATED", "1") == "1"
_ROT_ANCHORS = os.environ.get("BENCH_ROT_ANCHORS", "auto")
if _ROT_ANCHORS != "auto":
    _ROT_ANCHORS = int(_ROT_ANCHORS) or None


def canary_tflops() -> float:
    """Chained 2048^3 bf16 matmul rate — a fixed tiny program that
    calibrates how fast the SHARED chip is running this session, so any
    bench capture is interpretable against chip/relay load (DESIGN.md:
    bit-identical frame programs measured 28-38 fps across sessions)."""
    n = 2048
    x = jnp.ones((n, n), jnp.bfloat16)
    w = jnp.eye(n, dtype=jnp.bfloat16) * 1.00001

    @functools.partial(jax.jit, static_argnames=("iters",))
    def loop(x, iters):
        def body(_, x):
            return jnp.dot(x, w, preferred_element_type=jnp.bfloat16)
        return jax.lax.fori_loop(0, iters, body, x)

    for it in (64, 128):
        _ = np.asarray(loop(x, it)[0, 0])
    ts = []
    for it in (64, 128, 64, 128):
        t0 = time.perf_counter()
        _ = np.asarray(loop(x, it)[0, 0])
        ts.append(time.perf_counter() - t0)
    t64, t128 = min(ts[0], ts[2]), min(ts[1], ts[3])
    dt = t128 - t64
    if dt <= 0.05 * t64:
        # tunnel-noise inversion (same guard as measure_fps): report the
        # conservative whole-invocation rate, never an absurd marginal
        return 2 * n**3 * 128 / t128 / 1e12
    return 2 * n**3 * 64 / dt / 1e12


def measure_fps(run_loop_n, iters: int, reps: int = 5):
    """-> (marginal FPS, single-loop median FPS) for a compiled loop
    family ``run_loop_n(n)`` (n on-device frames per invocation).

    Every host<->device interaction on this rig is an eagerly dispatched
    op + a tunneled fetch (~0.3-1s, run-to-run noisy), and each program
    invocation carries an unknown fixed relay cost — subtracting a probed
    "RTT" left tens-of-percent swings (observed 28-38 fps for the
    bit-identical program across one session). The marginal rate
    ``iters / (median T(2N) - median T(N))`` cancels EVERY fixed
    per-invocation cost by construction (both invocations pay it once);
    only the extra N frames differ. The single-loop median (no
    subtraction at all) is reported alongside as a conservative
    lower bound including all tunnel overhead.
    """
    t_n, t_2n = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run_loop_n(iters)
        t_n.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run_loop_n(2 * iters)
        t_2n.append(time.perf_counter() - t0)
    dt = float(np.median(t_2n)) - float(np.median(t_n))
    lower = iters / float(np.median(t_n))
    if dt <= 0.05 * float(np.median(t_n)):
        # tunnel-noise inversion (T(2N) barely above T(N)): a marginal
        # estimate here would be absurdly fast — report the conservative
        # single-loop rate instead of a number nobody should trust
        return lower, lower
    return iters / dt, lower


def marginal_frame_rate(frame_fn, params_g, params_c, image, iters):
    """Shared harness for the per-frame sections: compile a chained
    on-device fori_loop over ``frame_fn(params_g, params_c, img) -> out``
    (must return a dict with 'mask'; the mask-sum*1e-12 perturbation
    serializes the chain without changing values) at N and 2N frames and
    return measure_fps' (marginal fps, single-loop lower bound)."""
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params_g, params_c, img, n):
        def body(_, img):
            out = frame_fn(params_g, params_c, img)
            return img + out["mask"].astype(jnp.float32).sum() * 1e-12
        return jax.lax.fori_loop(0, n, body, img)

    for n in (iters, 2 * iters):
        _ = np.asarray(loop(params_g, params_c, image, n)[0, 0, 0, 0])

    def run_n(n):
        _ = np.asarray(loop(params_g, params_c, image, n)[0, 0, 0, 0])

    return measure_fps(run_n, iters)


def build_frame():
    from monoport_tpu import get_cfg_defaults
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32) * 2 - 1)
    points = jnp.zeros((1, 1024, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    key = jax.random.PRNGKey(0)
    params_g = netG.init(key, image, points, calib)
    params_c = netC.init(key, image, points, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))

    # Operating point from the measured sweep (DESIGN.md): dense volume
    # only to 65^3 (volume ops are latency-bound on TPU), per-ray fine
    # refinement at 257^2 rays x 6 taps (validated: median depth error
    # < 1 fine voxel vs the exact fine-volume peel).
    recon = HierarchicalRecon(
        resolutions=(17, 33, 65),
        budgets=(0, 4096, 16384),
        boundary_tau=cfg.recon.boundary_tau,
        dilate=cfg.recon.dilate,
        balance_value=cfg.recon.balance_value,
        select="uncertain")  # overflow degrades gracefully, never truncates
    # fine rays restricted to a 192^2 bbox window (75% of the frame —
    # matches the reference's own detection-region prior, RTL/main.py:290)
    engine = ReconEngine(netG, netC, recon=recon,
                 config=EngineCfg.flat(mode="ray", fine_res=257,
                                       ray_taps=_RAY_TAPS,
                                       ray_window=_RAY_WINDOW,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=True,
                                       use_ray_query=_RAY_QUERY,
                                       march_levels=_MARCH_LEVELS if _MARCH else None))
    if _BF16_FEATS:
        engine._feats_f32 = lambda feats: feats

    from monoport_tpu.recon.depth_peel import colorize, shade_normal, visualize
    from monoport_tpu.recon.ray_refine import ray_pyramid, ray_refine

    def _analytic(pts):
        center = jnp.asarray([0.0, -0.1, 0.0])
        radii = jnp.asarray([0.35, 0.8, 0.25])
        d = jnp.linalg.norm((pts - center) / radii, axis=-1)
        return jax.nn.sigmoid((1.0 - d) * 20.0)

    def frame_impl(params_g, params_c, image_g, image_c, calib_t):
        params_g = engine._cast(params_g)
        params_c = engine._cast(params_c)
        image_g = engine._cast(image_g)
        image_c = engine._cast(image_c)
        feats_g = engine.netG.apply(params_g, image_g, method="filter")
        feats_g = engine._feats_f32(feats_g)
        head_g = engine._head_fn(engine.netG, params_g)

        def query_occ(pts):
            pred = engine.netG.apply(params_g, feats_g, pts, calib_t,
                                     method="query", head_fn=head_g)[0]
            analytic = _analytic(pts)[..., None]
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        # fine pass via the ray-structured fused kernel (same swap: the
        # real gather+MLP compute runs, the analytic value is selected)
        qt = engine._query_taps_fn(engine.netG, params_g, feats_g, calib_t)

        def query_taps_occ(xy, wz):
            pred = qt(xy, wz)                              # [1, R, T]
            pts = jnp.concatenate([
                jnp.broadcast_to(xy[:, :, None], xy.shape[:2]
                                 + (wz.shape[-1], 2)),
                wz[..., None]], axis=-1)
            analytic = _analytic(pts)
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        # grid-structured variant (separable gather-free sampling)
        qg = engine._query_grid_fn(engine.netG, params_g, feats_g, calib_t)

        def query_grid_occ(xw, yw, wz):
            pred = qg(xw, yw, wz)                          # [H, W, T]
            h, w, t = wz.shape
            pts = jnp.stack([
                jnp.broadcast_to(xw[:, None, None], (h, w, t)),
                jnp.broadcast_to(yw[None, :, None], (h, w, t)), wz], -1)
            analytic = _analytic(pts)
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        if _MARCH and qt is not None:
            counts = [jnp.zeros((), jnp.int32)]   # no hierarchy bands
            maps = ray_pyramid(query_occ, engine.fine_res,
                               levels=engine.march_levels,
                               taps=engine.ray_taps,
                               window=engine.ray_window,
                               query_taps_fn=query_taps_occ,
                               query_grid_fn=(query_grid_occ
                                              if qg is not None else None))
        else:
            vol, counts = engine.recon(query_occ, return_counts=True)
            maps = ray_refine(query_occ, vol, engine.fine_res,
                              taps=engine.ray_taps, window=engine.ray_window,
                              query_taps_fn=(query_taps_occ
                                             if qt is not None else None))
        render_norm, mask = visualize(shade_normal(maps), engine.render_size)
        feat_prior = feats_g[-1][-1]
        feats_c = engine.netC.apply(params_c, image_c, feat_prior,
                                    method="filter")
        feats_c = engine._feats_f32(feats_c)
        head_c = engine._head_fn(engine.netC, params_c)

        cg = engine._grid_color_fn(engine.netC, params_c, feats_c, calib_t)
        if cg is not None:   # gather-free windowed texture (engine fast path)
            tex_canvas = engine._texture_canvas(maps, engine.fine_res, color_grid=cg)
        else:
            def query_color(pts):
                return engine.netC.apply(params_c, feats_c, pts, calib_t,
                                         method="query", head_fn=head_c)[0]

            tex_canvas = colorize(maps, query_color, engine.fine_res)
        render_tex, mask_tex = visualize(tex_canvas, engine.render_size)
        return {"render_norm": render_norm, "render_tex": render_tex,
                "mask": mask_tex,
                "recon_counts": jnp.stack(counts).astype(jnp.int32)}

    return frame_impl, params_g, params_c, image, calib, engine


def _build_real():
    """Trained-weights engine + params for the real-model benches; None if
    the committed checkpoint is absent."""
    import os

    ckpt = os.path.join(os.path.dirname(__file__), "monoport_tpu", "data",
                        "netg_capsule.npz")
    if not os.path.exists(ckpt):
        return None
    from monoport_tpu import get_cfg_defaults
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.hierarchy import HierarchicalRecon
    from monoport_tpu.utils.params_io import load_params

    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    params_g = {"params": load_params(ckpt)[0]}
    ckpt_c = os.path.join(os.path.dirname(ckpt), "netc_capsule.npz")
    netC, params_c = None, None
    if os.path.exists(ckpt_c):   # trained color net: full textured path
        netC = MonoPortNet(cfg.netC)
        params_c = {"params": load_params(ckpt_c)[0]}
    recon = HierarchicalRecon(resolutions=(17, 33, 65),
                              budgets=(0, 4096, 16384),
                              select="uncertain")
    engine = ReconEngine(netG, netC, recon=recon,
                 config=EngineCfg.flat(mode="ray", fine_res=257,
                                       ray_taps=_RAY_TAPS,
                                       ray_window=_RAY_WINDOW,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=True,
                                       march_levels=_MARCH_LEVELS if _MARCH else None,
                                       march_rotated=_MARCH_ROTATED,
                                       rot_anchors=_ROT_ANCHORS))
    return netG, params_g, netC, params_c, engine


def bench_kernel(engine, params_g, image, calib):
    """BASELINE.md kernel metric: query-points/sec through the fused
    pixel-aligned sampling + occupancy-MLP path (project -> bilinear
    `index` -> z-feature -> Pallas fused MLP). The reference's own
    micro-bench runs the torch MLP at 50k points for 1.9M pts/s
    (heads/SurfaceClassifier.py:102, geometry.py:4-16); measured here at
    a ~50k batch (comparability) and a 512k batch (MXU saturation),
    with the same marginal-rate method as the frame bench."""
    netG = engine.netG
    params_gc = engine._cast(params_g)
    feats = netG.apply(params_gc, engine._cast(image), method="filter")
    feats = engine._feats_f32(feats)
    head_g = engine._head_fn(netG, params_gc)
    out = {}
    for label, n_pts, iters in (("50k", 50176, 256), ("512k", 524288, 32)):
        pts = jax.random.uniform(jax.random.PRNGKey(3), (1, n_pts, 3),
                                 minval=-0.9, maxval=0.9)

        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(feats, pts, n):
            def body(_, carry):
                pts, acc = carry
                pred = netG.apply(params_gc, feats, pts, calib,
                                  method="query", head_fn=head_g)[-1]
                # serialized data dependency so XLA cannot collapse the
                # chain; the perturbation is numerically invisible
                return (pts + pred.mean() * 1e-12, acc + pred.sum())
            return jax.lax.fori_loop(0, n, body, (pts, jnp.float32(0)))[1]

        for n in (iters, 2 * iters):
            _ = np.asarray(loop(feats, pts, n))

        def run_loop_n(n):
            _ = np.asarray(loop(feats, pts, n))

        rate, rate_lower = measure_fps(run_loop_n, iters)
        out[f"kernel_mpts_{label}"] = round(rate * n_pts / 1e6, 1)
    out["kernel_vs_baseline_1p9mpts"] = round(
        out["kernel_mpts_512k"] / 1.9, 1)
    return out


def bench_frames(real, single_fps: float, clip: int = 8, iters: int = 8):
    """Batched video mode (BASELINE config #4: recon over 8-frame clips):
    engine.frames processes a [B, 512, 512, 3] clip in one vmapped
    program. Reports clip throughput in frames/s and the speedup over
    the measured single-frame rate — the batch dimension is where MXU
    utilization shows at batch-1-starved layer sizes."""
    import functools as ft

    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)

    netG, params_g, netC, params_c, engine = real
    keys = jax.random.split(jax.random.PRNGKey(2024), clip)
    images = jnp.stack([render_front(skeleton3d(k), 512)[0] for k in keys])
    calibs = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None, None],
                      (clip, 1, 1, 1))
    imgs = images[:, None]                              # [B, 1, H, W, 3]

    vmapped = jax.vmap(
        ft.partial(engine._frame_impl, use_taps=True, use_grid=True),
        in_axes=(None, None, 0, 0 if netC is not None else None, 0))

    @ft.partial(jax.jit, static_argnames=("n",))
    def loop(params_g, params_c, imgs, n):
        def body(_, imgs):
            out = vmapped(params_g, params_c, imgs,
                          imgs if netC is not None else None, calibs)
            return imgs + out["mask"].astype(jnp.float32).sum() * 1e-12
        return jax.lax.fori_loop(0, n, body, imgs)

    for n in (iters, 2 * iters):
        _ = np.asarray(loop(params_g, params_c, imgs, n)[0, 0, 0, 0, 0])

    def run_n(n):
        _ = np.asarray(loop(params_g, params_c, imgs, n)[0, 0, 0, 0, 0])

    clip_rate, clip_lower = measure_fps(run_n, iters)
    fps = clip_rate * clip
    return {
        "frames_mode_clip": clip,
        "frames_mode_fps": round(fps, 2),
        "frames_mode_speedup_vs_single": round(fps / single_fps, 2)
        if single_fps else None,
    }


def bench_frames_sweep(real, single_fps: float, clips=(8, 16, 32)):
    """Clip-size sweep to saturation (VERDICT r3 item 4): frames/s at
    each batched clip size, so the bench records where the batch axis
    stops buying MXU utilization. Same program family as bench_frames."""
    out = {}
    for clip in clips:
        r = bench_frames(real, single_fps, clip=clip,
                         iters=max(2, 16 // clip))
        out[f"frames_mode_fps_clip{clip}"] = r["frames_mode_fps"]
    return out


def bench_crossfam(real):
    """Cross-family generalization (VERDICT r3 item 3, r4 item 4):
    silhouette IOU — and, with the trained netC present, texture PSNR —
    of the committed weights on bodies the capsule training family cannot
    emit: superquadric limbs (shaded + flat renders) and the PPL-fixture
    ellipsoid, at the production 257-ray profile. Geometry GT is the
    analytic occupancy's z-swept silhouette; texture GT is the shared
    render_front_occ shading model evaluated at the RECONSTRUCTED surface
    (capsule.gt_texture_canvas — valid for superquadrics because both
    families render through the same model). Full sweep over seeds and
    profiles in scripts/eval_crossfam.py."""
    from monoport_tpu.recon.depth_peel import visualize
    from monoport_tpu.training.datasets import superquadric as sq
    from monoport_tpu.training.datasets.capsule import gt_texture_canvas
    from monoport_tpu.training.datasets.fixture import RADII
    from monoport_tpu.training.metrics import masked_psnr

    netG, params_g, netC, params_c, engine = real
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    def gt_sil(occ_fn, res=257, n_z=64):
        ax = jnp.linspace(-1, 1, res)
        gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
        zs = jnp.linspace(-1, 1, n_z)
        occ = jax.vmap(lambda z: occ_fn(
            jnp.stack([gx, gy, jnp.full_like(gx, z)], -1)) > 0.5)(zs)
        return np.asarray(occ.any(axis=0))

    def iou_tex(image, occ_fn, flat=False):
        maps = engine.frame(params_g, image[None], params_c,
                            image[None] if params_c is not None else None,
                            calib=calib)
        got = np.asarray(maps["valid"]) > 0.5
        gt = gt_sil(occ_fn)
        iou = round(float((got & gt).sum() / max((got | gt).sum(), 1)), 4)
        psnr = None
        if netC is not None and "render_tex" in maps:
            gt_canvas = gt_texture_canvas(jnp.asarray(maps["depth"]),
                                          jnp.asarray(maps["valid"]),
                                          engine.fine_res, flat=flat)
            gt_vis, _ = visualize(gt_canvas, engine.render_size)
            m = np.asarray(maps["mask"])
            m = (m[..., 0] if m.ndim == 3 else m) > 0.5
            psnr, _ = masked_psnr(np.asarray(maps["render_tex"]),
                                  np.asarray(gt_vis), m)
            psnr = round(psnr, 2)
        return iou, psnr

    body = sq.sq_body(jax.random.PRNGKey(31337))
    occ = lambda pts: sq.sq_occupancy(pts, body)  # noqa: E731
    out = {}
    out["crossfam_iou_sq"], out["crossfam_tex_psnr_sq"] = iou_tex(
        sq.render_front(body, 512)[0], occ)
    out["crossfam_iou_sq_flat"], out["crossfam_tex_psnr_sq_flat"] = iou_tex(
        sq.render_front(body, 512, flat=True)[0], occ, flat=True)
    from monoport_tpu.training.datasets.fixture import _render_rgba
    rgba = np.asarray(_render_rgba(0, 512), dtype=np.float32) / 255.0
    ell_img = jnp.asarray((rgba[..., :3] * 2.0 - 1.0)
                          * (rgba[..., 3:4] > 0.5))
    radii = jnp.asarray(RADII)
    out["crossfam_iou_ellipsoid"], _ = iou_tex(
        ell_img,
        lambda pts: (jnp.square(pts / radii).sum(-1) <= 1.0
                     ).astype(jnp.float32))
    return {k: v for k, v in out.items() if v is not None}


def bench_rotated(real, iters: int = 40):
    """Free-viewpoint path: the demo's orbit camera (RTL/scene.py:122-137)
    rotates the view extrinsic, so the recon calib has z-terms in its
    image rows and every taps/grid-structured fast path is off. The frame
    then runs the per-point march pyramid (march_rotated, r3) or — with
    BENCH_MARCH_ROTATED=0 — the r2 hierarchy fallback, for the A/B.
    Trained weights, yaw 20 / pitch 10 orbit pose."""
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)

    netG, params_g, netC, params_c, engine = real
    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    calib = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                   np.eye(4, dtype=np.float32)))
    assert not engine._calib_taps_ok(calib)
    rot_k = engine._rot_anchor_plan(calib, image.shape[1])

    def frame(params_g, params_c, img):
        return engine._frame_impl(params_g, params_c, img,
                                  img if netC is not None else None,
                                  calib, use_taps=False, use_grid=False,
                                  rot_k=rot_k)

    fps, fps_lower = marginal_frame_rate(frame, params_g, params_c, image,
                                         iters)
    mode = ("march_pyramid" if engine.march_levels and engine.march_rotated
            else "hierarchy")
    out = {"rotated_fps": round(fps, 2),
           "rotated_fps_incl_tunnel_overhead": round(fps_lower, 2),
           "rotated_mode": mode,
           "rotated_compact": engine.compact_rotated,
           "rotated_anchors": str(rot_k)}

    # adaptive compaction budget (the r4 demo loop, rtl_main): one warmup
    # frame measures the valid fraction, the next frames run the snapped
    # COMPACT_LADDER rung — exactly the feedback the pipeline applies
    if engine.compact_rotated is not None:
        from monoport_tpu.engine import _snap_budget
        warm = engine.frame(params_g, image, params_c,
                            image if netC is not None else None,
                            calib=calib)
        hint = engine.compact_hint_from_valid(
            float(np.asarray(warm["valid"]).astype(np.float32).mean()))
        budget = _snap_budget(hint, engine.compact_rotated)
        out["rotated_adaptive_budget"] = budget
        if budget != engine.compact_rotated:
            def frame_a(params_g, params_c, img):
                return engine._frame_impl(
                    params_g, params_c, img,
                    img if netC is not None else None, calib,
                    use_taps=False, use_grid=False, rot_k=rot_k,
                    compact_budget=budget)

            fps_a, fps_a_low = marginal_frame_rate(frame_a, params_g,
                                                   params_c, image, iters)
            o = engine.frame(params_g, image, params_c,
                             image if netC is not None else None,
                             calib=calib, compact_hint=hint)
            out["rotated_adaptive_fps"] = round(fps_a, 2)
            out["rotated_adaptive_fps_incl_tunnel_overhead"] = round(
                fps_a_low, 2)
            out["rotated_adaptive_dropped"] = np.asarray(
                o["compact_dropped"]).tolist()
        else:
            out["rotated_adaptive_fps"] = out["rotated_fps"]
    return out


V5E_PEAK_BF16_TFLOPS = 197.0          # MXU peak, one v5e chip
V5E_HBM_GBPS = 819.0                  # HBM bandwidth, one v5e chip


def _cpu_cost(fn, *args) -> dict:
    """XLA cost analysis (flops / bytes accessed) of ``fn(*args)`` lowered
    for CPU — the HLO cost model is platform-independent for dots/convs,
    so this counts the program's algebraic work without a TPU compile."""
    compiled = jax.jit(fn, backend="cpu").lower(*args).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, list) else ca
    return {"gflops": float(ca.get("flops", 0.0)) / 1e9,
            "gbytes": float(ca.get("bytes accessed", 0.0)) / 1e9}


def bench_mfu(real, result: dict):
    """MFU / roofline accounting (VERDICT r3 item 2): count the frame
    program's FLOPs and HBM bytes with XLA's own cost model, then relate
    the measured FPS to the chip's peak and to the same-run canary.

    The counted twin runs use_pallas=False (apply_ray_xla and the flax
    heads are the same arithmetic as the kernels, and pallas_call does not
    lower for the CPU cost model); dtypes and shapes are the production
    ones, so the FLOP count is the real program's. ``mfu_pct`` is
    FLOPs*fps / 197 TF (v5e bf16 peak); ``vs_canary_pct`` uses the
    session's measured achievable rate instead (chip sharing / relay load
    cancel out). Arithmetic intensity (FLOP/byte) against the ~240 FLOP/B
    v5e ridge says whether a program is compute- or HBM-bound; the
    per-stage split lives in scripts/roofline_stages.py + DESIGN.md."""
    import dataclasses

    from monoport_tpu.engine import ReconEngine

    netG, params_g, netC, params_c, engine = real
    twin = ReconEngine(netG, netC, recon=engine.recon,
                       config=dataclasses.replace(engine.config,
                                                  use_pallas=False))
    image = jnp.zeros((1, 512, 512, 3), jnp.float32)
    front = jnp.eye(4, dtype=jnp.float32)[None]
    out = {}

    def frame(use_taps, use_grid, calib, rot_k=()):
        def fn(pg, pc, img):
            return twin._frame_impl(pg, pc, img,
                                    img if netC is not None else None,
                                    calib, use_taps=use_taps,
                                    use_grid=use_grid, rot_k=rot_k)
        return _cpu_cost(fn, params_g, params_c, image)

    cost_f = frame(True, True, front)
    out["frontal_gflops"] = round(cost_f["gflops"], 1)
    out["frontal_hbm_gb"] = round(cost_f["gbytes"], 2)
    out["frontal_intensity_flop_per_byte"] = round(
        cost_f["gflops"] / max(cost_f["gbytes"], 1e-9), 1)
    fps = result.get("real_fps")
    if fps:
        tflops = cost_f["gflops"] * fps / 1e3
        out["frontal_achieved_tflops"] = round(tflops, 1)
        out["frontal_mfu_pct"] = round(100 * tflops / V5E_PEAK_BF16_TFLOPS,
                                       1)
        out["frontal_hbm_gbps"] = round(cost_f["gbytes"] * fps, 0)

    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    rot_k = twin._rot_anchor_plan(rot, 512)
    cost_r = frame(False, False, rot, rot_k)
    out["rotated_gflops"] = round(cost_r["gflops"], 1)
    out["rotated_hbm_gb"] = round(cost_r["gbytes"], 2)
    rfps = result.get("rotated_fps")
    if rfps:
        tflops = cost_r["gflops"] * rfps / 1e3
        out["rotated_achieved_tflops"] = round(tflops, 1)
        out["rotated_mfu_pct"] = round(100 * tflops / V5E_PEAK_BF16_TFLOPS,
                                       1)
        out["rotated_hbm_gbps"] = round(cost_r["gbytes"] * rfps, 0)
    canary = result.get("canary_tflops_bf16")
    if canary:
        if fps:
            out["frontal_mfu_vs_canary_pct"] = round(
                100 * cost_f["gflops"] * fps / 1e3 / canary, 1)
        if rfps:
            out["rotated_mfu_vs_canary_pct"] = round(
                100 * cost_r["gflops"] * rfps / 1e3 / canary, 1)
    return out


def bench_backbones(engine, params_g, params_c, image):
    """Per-backbone forward rate at 1x512x512, the reference's own
    micro-bench contract (BASELINE.md: HGFilter 27.42 fps,
    HGFilters.py:233; ResnetFilter 39.68 fps, ResBlkFilters.py:163).
    Marginal-rate method over an on-device fori_loop chain, bf16 like the
    demo path."""
    out = {}
    nets = [("netg_filter_fps", engine.netG, engine._cast(params_g), None)]
    if engine.netC is not None and params_c is not None:
        prior = jnp.zeros((1, 128, 128, 256), engine.compute_dtype)
        nets.append(("netc_filter_fps", engine.netC,
                     engine._cast(params_c), prior))
    img = engine._cast(image)
    for key, net, params, prior in nets:
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(params, img, n, net=net, prior=prior):
            def body(_, img):
                args = (img,) if prior is None else (img, prior)
                feats = net.apply(params, *args, method="filter")
                return img + feats[-1][-1].mean().astype(img.dtype) * 1e-12
            return jax.lax.fori_loop(0, n, body, img)

        iters = 60
        for n in (iters, 2 * iters):
            _ = np.asarray(loop(params, img, n)[0, 0, 0, 0])

        def run_n(n):
            _ = np.asarray(loop(params, img, n)[0, 0, 0, 0])

        rate, _ = measure_fps(run_n, iters)
        out[key] = round(rate, 1)
    if "netg_filter_fps" in out:
        out["netg_filter_vs_ref_27p42"] = round(
            out["netg_filter_fps"] / 27.42, 1)
    return out


def bench_real(real, iters: int = 60):
    # 60 on-device frames (~2s): the tunnel's fetch RTT (~0.5-1s, run-to-
    # run noisy) is subtracted from the measured wall time, so short loops
    # let RTT variance swing the FPS estimate by 10s of percent (observed
    # 28 vs 48 fps at iters=20); a longer chain amortizes it.
    """Real-model bench: the TRAINED capsule netG (committed weights, see
    apps/train_capsule_netG.py) on a rendered synthetic person, no
    analytic swap anywhere — the code path users run. Reports FPS plus
    geometry quality: the ray path vs the model's own dense 257^3 volume
    (path exactness) and the model vs the analytic ground truth (model
    quality)."""
    netG, params_g, netC, params_c, engine = real
    recon = engine.recon

    from monoport_tpu.recon.depth_peel import depth_peel
    from monoport_tpu.recon.hierarchy import HierarchicalRecon
    from monoport_tpu.training.datasets.capsule import (capsule_occupancy,
                                                        render_front,
                                                        skeleton3d)

    caps = skeleton3d(jax.random.PRNGKey(31337))   # held-out body
    image = render_front(caps, 512)[0][None]
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params_g, params_c, img, n):
        def body(_, carry):
            img, counts = carry
            out = engine._frame_impl(params_g, params_c, img,
                                     img if netC is not None else None,
                                     calib, use_taps=True, use_grid=True)
            counts = out.get("recon_counts", counts)  # march: no bands
            return (img + out["mask"].astype(jnp.float32).sum() * 1e-12,
                    counts)
        n_lv = len(recon.resolutions) - 1
        return jax.lax.fori_loop(0, n, body,
                                 (img, jnp.zeros((n_lv,), jnp.int32)))

    for n in (iters, 2 * iters):                     # compile both lengths
        out, counts = loop(params_g, params_c, image, n)
        _ = np.asarray(out[0, 0, 0, 0])

    def run_loop_n(n):
        out, _ = loop(params_g, params_c, image, n)
        _ = np.asarray(out[0, 0, 0, 0])

    fps, fps_lower = measure_fps(run_loop_n, iters)

    # quality (one-off, outside timing): ray maps vs the model's own dense
    # 257^3 volume, and the model's silhouette vs the analytic body
    maps = engine.frame(params_g, image, params_c,
                        image if netC is not None else None, calib)
    dense = HierarchicalRecon(resolutions=(17, 33, 65, 129, 257),
                              select="uncertain")
    feats = netG.apply(engine._cast(params_g), engine._cast(image),
                       method="filter")
    feats = engine._feats_f32(feats)

    def query(pts):
        return netG.apply(engine._cast(params_g), feats, pts, calib,
                          method="query",
                          head_fn=engine._head_fn(netG,
                                                  engine._cast(params_g)))[0]

    vol = dense(query)
    oracle = depth_peel(vol, "front", 0.5)
    got_v = np.asarray(maps["valid"]) > 0.5
    want_v = np.asarray(oracle.valid) > 0.5
    iou_path = float((got_v & want_v).sum() / max((got_v | want_v).sum(), 1))
    both = got_v & want_v
    err = np.abs(np.asarray(maps["depth"])
                 - np.asarray(oracle.depth))[both]

    # model-vs-GT silhouette at the fine ray grid
    ax = jnp.linspace(-1, 1, 257)
    gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
    gt_sil = None
    zs = jnp.linspace(-1, 1, 64)
    for z in zs:   # cheap host loop, one-off
        occ = np.asarray(capsule_occupancy(
            jnp.stack([gx, gy, jnp.full_like(gx, z)], -1), caps)) > 0.5
        gt_sil = occ if gt_sil is None else (gt_sil | occ)
    iou_gt = float((got_v & gt_sil).sum() / max((got_v | gt_sil).sum(), 1))

    # texture quality: netC's rendered color vs the renderer's known
    # shading model at the reconstructed surface (VERDICT r2 item 6;
    # reference colorization contract RTL/main.py:229-249)
    tex_psnr, tex_mae = None, None
    if netC is not None and "render_tex" in maps:
        from monoport_tpu.recon.depth_peel import visualize
        from monoport_tpu.training.datasets.capsule import gt_texture_canvas
        from monoport_tpu.training.metrics import masked_psnr

        gt_canvas = gt_texture_canvas(jnp.asarray(maps["depth"]),
                                      jnp.asarray(maps["valid"]), 257)
        gt_vis, _ = visualize(gt_canvas, engine.render_size)
        m = np.asarray(maps["mask"])
        m = (m[..., 0] if m.ndim == 3 else m) > 0.5
        tex_psnr, tex_mae = masked_psnr(np.asarray(maps["render_tex"]),
                                        np.asarray(gt_vis), m)

    out = {
        "real_fps": round(fps, 2),
        "real_fps_incl_tunnel_overhead": round(fps_lower, 2),
        "real_ray_vs_dense_iou": round(iou_path, 4),
        "real_depth_err_med_voxels": round(float(np.median(err)), 3),
        "real_model_vs_gt_iou": round(iou_gt, 4),
    }
    if tex_psnr is not None:
        out["real_tex_psnr_db"] = round(tex_psnr, 2)
        out["real_tex_mae"] = round(tex_mae, 4)
    if not _MARCH:
        out["real_band_counts"] = np.asarray(counts).tolist()
    return out


# Global wall-clock budget for the AUXILIARY sections (seconds). Round 4's
# official artifact was rc=124/parsed=null: bench.py guarded sections
# against exceptions but not wall-clock, and printed its single JSON line
# only at the very end, so the driver's timeout destroyed every number —
# including the core fps measured 20+ minutes earlier (VERDICT r4 item 1).
# The budget is checked before each section; whatever would start after the
# deadline is recorded in 'skipped_sections' instead of run. The default
# sits near the round-3 full-run scale (that run completed on this driver).
DEFAULT_BUDGET_S = 1800.0


def _emit(result: dict) -> None:
    print(json.dumps(result), flush=True)


def run_sections(result: dict, sections, budget_s: float,
                 clock=time.monotonic, emit=_emit) -> dict:
    """Run auxiliary bench sections under a global wall-clock budget,
    emitting the (monotonically growing) result line INCREMENTALLY.

    ``result`` must already hold the core metric; it is emitted before any
    section runs, so even a hard kill mid-section leaves a parsable tail —
    the driver parses the last JSON line of stdout, and each emitted line
    is a strict superset of the previous one. ``sections`` is a list of
    ``(name, fn)``; ``fn(result) -> dict`` is merged into result. A section
    that raises records ``{name}_error`` (degrade, never sink the core
    number); a section that would START after the deadline is skipped and
    listed in ``skipped_sections``. Per-section wall time is recorded in
    ``bench_section_s`` so future budgets can be calibrated from the
    artifact itself. Pure host logic — unit-tested with a fake clock and
    stub sections in tests/test_bench_budget.py."""
    t0 = clock()
    deadline = None if budget_s is None else t0 + budget_s
    emit(result)
    skipped = []
    section_s = {}
    for name, fn in sections:
        if deadline is not None and clock() >= deadline:
            skipped.append(name)
            continue
        t1 = clock()
        try:
            result.update(fn(result) or {})
        except Exception as e:  # noqa: BLE001
            result[f"{name}_error"] = repr(e)[:200]
        section_s[name] = round(clock() - t1, 1)
        result["bench_section_s"] = dict(section_s)
        emit(result)
    if skipped:
        result["skipped_sections"] = skipped
    result["bench_total_s"] = round(clock() - t0, 1)
    emit(result)
    return result


def main():
    frame_impl, params_g, params_c, image, calib, engine = build_frame()
    iters = 60  # long on-device chain: amortizes the noisy fetch RTT
    n_levels = 1 if _MARCH else len(engine.recon.resolutions) - 1

    @functools.partial(jax.jit, static_argnames=("n",))
    def bench_loop(params_g, params_c, img, n):
        # params enter as jit arguments (NOT closure constants: embedding
        # ~60MB of weights as IR literals blows up compile time and can
        # crash the TPU backend's register allocator)
        def body(_, carry):
            img, _ = carry
            out = frame_impl(params_g, params_c, img, img, calib)
            return (img + out["mask"].astype(jnp.float32).sum() * 1e-12,
                    out["recon_counts"])
        return jax.lax.fori_loop(
            0, n, body, (img, jnp.zeros((n_levels,), jnp.int32)))

    for n in (iters, 2 * iters):                     # compile both lengths
        out, counts = bench_loop(params_g, params_c, image, n)
        _ = np.asarray(out[0, 0, 0, 0])

    def run_loop_n(n):
        out, _ = bench_loop(params_g, params_c, image, n)
        _ = np.asarray(out[0, 0, 0, 0])

    fps, fps_lower = measure_fps(run_loop_n, iters)

    result = {
        "metric": "end-to-end recon FPS at 256^3-equivalent (netG filter +"
                  " coarse-to-fine occupancy + ray-refined depth/normals +"
                  " netC texture, single chip, one fused program)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
        "fps_incl_tunnel_overhead": round(fps_lower, 2),
        "recon_mode": ("march_pyramid" if _MARCH else "hierarchy"),
    }
    if not _MARCH:
        counts = np.asarray(counts).tolist()     # after timing: tiny fetch
        budgets = list(engine.recon.budgets[1:])
        result.update({
            "recon_band_counts": counts,
            "recon_band_budgets": budgets,
            "recon_band_overflow": any(
                c > b for c, b in zip(counts, budgets)),
        })
    # Auxiliary sections: value-ordered (VERDICT r4 item 1c), each checked
    # against the wall-clock budget, with the result line re-emitted after
    # every completed section so a driver timeout can never erase what
    # already ran. One shared trained-model build — the sections reuse the
    # same engine (and so the same jit caches) instead of retracing.
    real_box: list = []

    def _real():
        if not real_box:
            real_box.append(_build_real())
        return real_box[0]

    def _gated(env: str, needs_real: bool, fn):
        def run(result):
            if os.environ.get(env, "1") != "1":
                return {}
            if needs_real:
                real = _real()
                return fn(real, result) if real is not None else {}
            return fn(result)
        return run

    sections = [
        ("real", _gated("BENCH_REAL", True,
                        lambda real, res: bench_real(real))),
        ("rotated", _gated("BENCH_ROTATED", True,
                           lambda real, res: bench_rotated(real))),
        ("canary", lambda res: {"canary_tflops_bf16":
                                round(canary_tflops(), 1)}),
        ("mfu", _gated("BENCH_MFU", True, bench_mfu)),
        ("crossfam", _gated("BENCH_CROSSFAM", True,
                            lambda real, res: bench_crossfam(real))),
        ("frames", _gated("BENCH_FRAMES", True,
                          lambda real, res: bench_frames(
                              real, res.get("real_fps")))),
        ("frames_sweep", _gated("BENCH_FRAMES_SWEEP", True,
                                lambda real, res: bench_frames_sweep(
                                    real, res.get("real_fps"),
                                    clips=(16, 32)))),
        ("kernel", _gated("BENCH_KERNEL", False,
                          lambda res: bench_kernel(engine, params_g,
                                                   image, calib))),
        ("backbones", _gated("BENCH_BACKBONES", False,
                             lambda res: bench_backbones(
                                 engine, params_g, params_c, image))),
    ]
    budget = float(os.environ.get("BENCH_BUDGET_S", DEFAULT_BUDGET_S))
    result["bench_core_s"] = round(time.monotonic() - _T0, 1)
    run_sections(result, sections,
                 max(0.0, budget - (time.monotonic() - _T0)))


if __name__ == "__main__":
    main()
