"""Round-4 rotated-view A/B on the real chip, one session.

Under test: the ANCHORED refine query (monoport_net.query_taps_anchored +
ops/pallas/fused_ray_mlp.apply_anchor_packed) — K feature gathers + shared
skip projections per ray instead of T full per-point queries, K per level
from the calib (engine._rot_anchor_plan) — stacked on the r3 valid-ray
compaction, plus a tighter compaction budget.

  A. rotated march, compact 0.625, exact per-point refines (r3 shipped)
  B. rotated march, compact 0.625, anchored refines (auto plan)
  C. rotated march, compact 0.5,   anchored refines
  D. frontal grid frame, same session (reference point)

Quality spot-check: B vs A on the bench frame (anchored deviation on the
production profile; the CPU eval scripts/eval_rotated_anchored.py covers
pose sweeps).

Usage: python scripts/profile_rotated_r4.py   (TPU; compiles ride the
persistent cache on re-runs).
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from monoport_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import bench  # noqa: E402  (run from the repo root)


def measure(engine, netC, params_g, params_c, image, calib, use_taps,
            use_grid, rot_k=(), iters=40):
    def frame(params_g, params_c, img):
        return engine._frame_impl(params_g, params_c, img,
                                  img if netC is not None else None,
                                  calib, use_taps=use_taps,
                                  use_grid=use_grid, rot_k=rot_k)

    fps, lower = bench.marginal_frame_rate(frame, params_g, params_c,
                                           image, iters)
    return round(fps, 2), round(lower, 2)


def main():
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)

    out = {"canary_tflops_bf16_pre": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)
    real = bench._build_real()
    assert real is not None, "committed weights required"
    netG, params_g, netC, params_c, engine = real

    def fresh(compact):
        return ReconEngine(netG, netC, recon=engine.recon,
                   config=EngineCfg.flat(mode="ray", fine_res=engine.fine_res,
                                         ray_taps=engine.ray_taps,
                                         ray_window=engine.ray_window,
                                         compute_dtype=engine.compute_dtype,
                                         use_pallas=engine.use_pallas,
                                         march_levels=engine.march_levels,
                                         march_rotated=engine.march_rotated,
                                         compact_rotated=compact,
                                         rot_anchors="auto"))

    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    front = jnp.eye(4, dtype=jnp.float32)[None]
    assert not engine._calib_taps_ok(rot)
    plan = engine._rot_anchor_plan(rot, 512)
    out["anchor_plan"] = str(plan)
    print("plan:", plan, flush=True)

    t0 = time.time()
    eng_a = fresh(0.625)
    out["rot_pp_fps"], out["rot_pp_fps_lower"] = measure(
        eng_a, netC, params_g, params_c, image, rot, False, False, ())
    print("A rot compact=0.625 per-point:", out["rot_pp_fps"], flush=True)

    eng_b = fresh(0.625)
    out["rot_anch_fps"], out["rot_anch_fps_lower"] = measure(
        eng_b, netC, params_g, params_c, image, rot, False, False, plan)
    print("B rot compact=0.625 anchored:", out["rot_anch_fps"], flush=True)

    eng_c = fresh(0.5)
    out["rot_anch_c50_fps"], out["rot_anch_c50_fps_lower"] = measure(
        eng_c, netC, params_g, params_c, image, rot, False, False, plan)
    print("C rot compact=0.5 anchored:", out["rot_anch_c50_fps"],
          flush=True)

    # quality spot-check on this very frame: anchored vs per-point
    out_a = eng_a._frame(params_g, params_c, image, image, rot,
                         use_taps=False, use_grid=False, rot_k=())
    out_b = eng_b._frame(params_g, params_c, image, image, rot,
                         use_taps=False, use_grid=False, rot_k=plan)
    va = np.asarray(out_a["valid"])
    vb = np.asarray(out_b["valid"])
    out["valid_mismatch_frac"] = round(float((va != vb).mean()), 5)
    both = va & vb
    dd = np.abs(np.asarray(out_a["depth"])[both]
                - np.asarray(out_b["depth"])[both])
    out["depth_mad"] = round(float(dd.mean()) if both.any() else 1.0, 5)
    out["depth_p95"] = round(
        float(np.percentile(dd, 95)) if both.any() else 1.0, 5)
    out["tex_mad"] = round(float(np.abs(
        np.asarray(out_a["render_tex"])
        - np.asarray(out_b["render_tex"])).mean()), 5)
    out["dropped_b"] = np.asarray(out_b["compact_dropped"]).tolist()

    out["frontal_grid_fps"], _ = measure(
        eng_a, netC, params_g, params_c, image, front, True, True, ())
    print("D frontal grid:", out["frontal_grid_fps"], flush=True)

    out["canary_tflops_bf16_post"] = round(bench.canary_tflops(), 1)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
