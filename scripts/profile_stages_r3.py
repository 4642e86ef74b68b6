"""Per-stage cost ledger for the ROUND-3 frame program (march pyramid +
gather-free grid sampling) — the program bench.py actually ships.

Same method as profile_stages.py (nested prefixes, marginal-rate N vs 2N
chains, chip canary), but staged along the r3 path:

  filter -> march (ray_pyramid incl. fine grid window) -> shade/visualize
  -> netC filter -> gather-free texture + visualize

Run on TPU:  python scripts/profile_stages_r3.py
"""

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from monoport_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from bench import build_frame, canary_tflops, measure_fps  # noqa: E402
from monoport_tpu.recon.depth_peel import shade_normal, visualize  # noqa: E402
from monoport_tpu.recon.ray_refine import ray_pyramid  # noqa: E402


def main():
    _frame_impl, params_g, params_c, image, calib, engine = build_frame()
    assert engine.march_levels, "r3 profiler expects the march program"

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
        head_g = engine._head_fn(engine.netG, params_g)
        if stage == "filter":
            return feats_g[-1][-1].astype(jnp.float32).sum()

        def query_occ(pts):
            pred = engine.netG.apply(params_g, feats_g, pts, calib,
                                     method="query", head_fn=head_g)[0]
            analytic = _analytic(pts)[..., None]
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        qt = engine._query_taps_fn(engine.netG, params_g, feats_g, calib)

        def query_taps_occ(xy, wz):
            pred = qt(xy, wz)
            pts = jnp.concatenate([
                jnp.broadcast_to(xy[:, :, None], xy.shape[:2]
                                 + (wz.shape[-1], 2)),
                wz[..., None]], axis=-1)
            analytic = _analytic(pts)
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        qg = engine._query_grid_fn(engine.netG, params_g, feats_g, calib)

        def query_grid_occ(xw, yw, wz):
            pred = qg(xw, yw, wz)
            h, w, t = wz.shape
            pts = jnp.stack([
                jnp.broadcast_to(xw[:, None, None], (h, w, t)),
                jnp.broadcast_to(yw[None, :, None], (h, w, t)), wz], -1)
            analytic = _analytic(pts)
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        maps = ray_pyramid(query_occ, engine.fine_res,
                           levels=engine.march_levels, taps=engine.ray_taps,
                           window=engine.ray_window,
                           query_taps_fn=query_taps_occ,
                           query_grid_fn=(query_grid_occ
                                          if qg is not None else None))
        if stage == "march":
            return maps.depth.sum() + maps.valid.astype(jnp.float32).sum()

        render_norm, mask = visualize(shade_normal(maps), engine.render_size)
        if stage == "shade":
            return render_norm.astype(jnp.float32).sum()

        feat_prior = feats_g[-1][-1]
        feats_c = engine.netC.apply(params_c, image_g, feat_prior,
                                    method="filter")
        feats_c = engine._feats_f32(feats_c)
        if stage == "cfilter":
            return (feats_c[-1][-1].astype(jnp.float32).sum()
                    + render_norm.astype(jnp.float32).sum())

        cg = engine._grid_color_fn(engine.netC, params_c, feats_c, calib)
        tex_canvas = engine._texture_canvas(maps, engine.fine_res, color_grid=cg)
        render_tex, _mask_tex = visualize(tex_canvas, engine.render_size)
        return (render_tex.astype(jnp.float32).sum()
                + render_norm.astype(jnp.float32).sum())

    @functools.partial(jax.jit, static_argnames=("n", "stage"))
    def loop(params_g, params_c, img, n, stage):
        def body(_, img):
            s = staged(params_g, params_c, img, stage)
            return img + s * 1e-12
        return jax.lax.fori_loop(0, n, body, img)

    stages = ["filter", "march", "shade", "cfilter", "tex"]
    if "--trace-check" in sys.argv:
        # abstract trace only (fast on CPU): catches shape/dtype bugs
        # without compiling the 512^2 program
        for stage in stages:
            out = jax.eval_shape(
                functools.partial(loop, n=2, stage=stage),
                params_g, params_c, image)
            print(json.dumps({"trace_ok": stage, "out": str(out.shape)}),
                  flush=True)
        return

    print(json.dumps({"canary_tflops_bf16": round(canary_tflops(), 1)}),
          flush=True)

    iters = 100
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
