"""Sub-profile the tex stage (14.7ms in the r3 ledger): netC ResBlk
filter vs the 257^2 texture query (colorize) vs visualize.

Prefixes on top of the full shade-stage program:
  texfilter = shade + netC filter (feat_prior concat included)
  texquery  = texfilter + colorize query at 257^2 surface points
  tex       = texquery + visualize  (== the full frame)

Run on TPU:  python scripts/profile_tex.py
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

from bench import build_frame, measure_fps  # noqa: E402
from scripts.profile_stages import canary_tflops  # noqa: E402


def main():
    frame_impl, params_g, params_c, image, calib, engine = build_frame()

    from monoport_tpu.recon.depth_peel import colorize, shade_normal, visualize
    from monoport_tpu.recon.ray_refine import ray_refine

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

        def query_occ(pts):
            pred = engine.netG.apply(params_g, feats_g, pts, calib,
                                     method="query", head_fn=head_g)[0]
            analytic = _analytic(pts)[..., None]
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        qt = engine._query_taps_fn(engine.netG, params_g, feats_g, calib)

        def query_taps_occ(xy, wz):
            pred = qt(xy, wz)
            pts = jnp.concatenate([
                jnp.broadcast_to(xy[:, :, None],
                                 xy.shape[:2] + (wz.shape[-1], 2)),
                wz[..., None]], axis=-1)
            analytic = _analytic(pts)
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        vol, _ = engine.recon(query_occ, return_counts=True)
        maps = ray_refine(query_occ, vol, engine.fine_res,
                          taps=engine.ray_taps, window=engine.ray_window,
                          query_taps_fn=query_taps_occ)
        render_norm, _ = visualize(shade_normal(maps), engine.render_size)

        feat_prior = feats_g[-1][-1]
        feats_c = engine.netC.apply(params_c, image_g, feat_prior,
                                    method="filter")
        feats_c = engine._feats_f32(feats_c)
        if stage == "texfilter":
            return (feats_c[-1][-1].astype(jnp.float32).sum()
                    + render_norm.astype(jnp.float32).sum())
        head_c = engine._head_fn(engine.netC, params_c)

        def query_color(pts):
            return engine.netC.apply(params_c, feats_c, pts, calib,
                                     method="query", head_fn=head_c)[0]

        tex_canvas = colorize(maps, query_color, engine.fine_res)
        if stage == "texquery":
            return (tex_canvas.astype(jnp.float32).sum()
                    + render_norm.astype(jnp.float32).sum())
        render_tex, _ = visualize(tex_canvas, engine.render_size)
        return (render_tex.astype(jnp.float32).sum()
                + render_norm.astype(jnp.float32).sum())

    @functools.partial(jax.jit, static_argnames=("n", "stage"))
    def loop(params_g, params_c, img, n, stage):
        def body(_, img):
            return img + staged(params_g, params_c, img, stage) * 1e-12
        return jax.lax.fori_loop(0, n, body, img)

    print(json.dumps({"canary_tflops_bf16": round(canary_tflops(), 1)}),
          flush=True)
    iters = 60
    ms = {}
    for stage in ("texfilter", "texquery", "tex"):
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
                          "fps": round(fps, 1)}), flush=True)
    print(json.dumps({
        "netc_filter_ms": round(ms["texfilter"], 2),
        "colorize_ms": round(ms["texquery"] - ms["texfilter"], 2),
        "visualize_ms": round(ms["tex"] - ms["texquery"], 2),
        "canary_tflops_bf16": round(canary_tflops(), 1)}), flush=True)


if __name__ == "__main__":
    main()
