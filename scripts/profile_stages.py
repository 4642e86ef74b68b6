"""Per-stage on-device cost ledger for the fused frame program.

VERDICT r2 item 1: before buying perf headroom, measure where the frame's
time actually goes. Times nested prefixes of the frame program (filter ->
+coarse hierarchy -> +ray refine -> +netC texture -> +composite) with the
same marginal-rate method as bench.py (N vs 2N frame chains cancel every
fixed per-invocation cost), so stage cost = prefix(k) - prefix(k-1).

Also prints a chip-speed canary (chained 2048^3 bf16 matmul TFLOP/s) so
any session's numbers are interpretable against shared-chip load
(DESIGN.md: identical programs measured 28-38 fps across sessions).

Run on TPU:  python scripts/profile_stages.py
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from monoport_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from bench import build_frame, measure_fps  # noqa: E402


def canary_tflops() -> float:
    """Chained bf16 matmul rate — fixed tiny program, compiles in seconds;
    calibrates how fast the shared chip is running THIS session."""
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
    dt = min(ts[1], ts[3]) - min(ts[0], ts[2])
    flops = 2 * n**3 * 64
    return flops / max(dt, 1e-9) / 1e12


def main():
    frame_impl, params_g, params_c, image, calib, engine = build_frame()

    from monoport_tpu.recon.depth_peel import colorize, shade_normal, visualize
    from monoport_tpu.recon.ray_refine import ray_refine

    # Re-derive the stage-gated variant of bench.build_frame's frame_impl.
    # Each stage returns something chainable (f32 scalar-ish reduction).
    def _analytic(pts):
        center = jnp.asarray([0.0, -0.1, 0.0])
        radii = jnp.asarray([0.35, 0.8, 0.25])
        d = jnp.linalg.norm((pts - center) / radii, axis=-1)
        return jax.nn.sigmoid((1.0 - d) * 20.0)

    def staged(params_g, params_c, image_g, stage: str):
        params_g = engine._cast(params_g)
        params_c = engine._cast(params_c)
        image_g = engine._cast(image_g)
        feats_g = engine.netG.apply(params_g, image_g, method="filter")
        feats_g = engine._feats_f32(feats_g)
        if stage == "filter":
            return feats_g[-1][-1].astype(jnp.float32).sum()
        head_g = engine._head_fn(engine.netG, params_g)

        def query_occ(pts):
            pred = engine.netG.apply(params_g, feats_g, pts, calib,
                                     method="query", head_fn=head_g)[0]
            analytic = _analytic(pts)[..., None]
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        vol, _counts = engine.recon(query_occ, return_counts=True)
        if stage == "coarse":
            return vol.astype(jnp.float32).sum()

        qt = engine._query_taps_fn(engine.netG, params_g, feats_g, calib)

        def query_taps_occ(xy, wz):
            pred = qt(xy, wz)
            pts = jnp.concatenate([
                jnp.broadcast_to(xy[:, :, None],
                                 xy.shape[:2] + (wz.shape[-1], 2)),
                wz[..., None]], axis=-1)
            analytic = _analytic(pts)
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        maps = ray_refine(query_occ, vol, engine.fine_res,
                          taps=engine.ray_taps, window=engine.ray_window,
                          query_taps_fn=query_taps_occ)
        if stage == "ray":
            return maps.depth.sum() + maps.valid.astype(jnp.float32).sum()
        render_norm, mask = visualize(shade_normal(maps), engine.render_size)
        if stage == "shade":
            return render_norm.astype(jnp.float32).sum()

        feat_prior = feats_g[-1][-1]
        feats_c = engine.netC.apply(params_c, image_g, feat_prior,
                                    method="filter")
        feats_c = engine._feats_f32(feats_c)
        head_c = engine._head_fn(engine.netC, params_c)

        def query_color(pts):
            return engine.netC.apply(params_c, feats_c, pts, calib,
                                     method="query", head_fn=head_c)[0]

        tex_canvas = colorize(maps, query_color, engine.fine_res)
        render_tex, mask_tex = visualize(tex_canvas, engine.render_size)
        return (render_tex.astype(jnp.float32).sum()
                + render_norm.astype(jnp.float32).sum())

    @functools.partial(jax.jit, static_argnames=("n", "stage"))
    def loop(params_g, params_c, img, n, stage):
        def body(_, img):
            s = staged(params_g, params_c, img, stage)
            return img + s * 1e-12
        return jax.lax.fori_loop(0, n, body, img)

    print(json.dumps({"canary_tflops_bf16": round(canary_tflops(), 1)}),
          flush=True)

    iters = 60
    stages = ["filter", "coarse", "ray", "shade", "tex"]
    ms = {}
    for stage in stages:
        for n in (iters, 2 * iters):
            out = loop(params_g, params_c, image, n, stage)
            _ = np.asarray(out[0, 0, 0, 0])

        def run_n(n, stage=stage):
            out = loop(params_g, params_c, image, n, stage)
            _ = np.asarray(out[0, 0, 0, 0])

        fps, fps_lower = measure_fps(run_n, iters)
        ms[stage] = 1000.0 / fps
        print(json.dumps({"prefix": stage,
                          "ms_per_frame": round(1000.0 / fps, 2),
                          "fps": round(fps, 1),
                          "fps_incl_overhead": round(fps_lower, 1)}),
              flush=True)

    ledger = {}
    prev = 0.0
    for stage in stages:
        ledger[stage] = round(ms[stage] - prev, 2)
        prev = ms[stage]
    print(json.dumps({"stage_ms": ledger,
                      "total_ms": round(ms[stages[-1]], 2),
                      "canary_tflops_bf16": round(canary_tflops(), 1)}),
          flush=True)


if __name__ == "__main__":
    main()
