"""Rotated-view compaction A/B on the real chip, one session.

Under test: engine.compact_rotated — the per-point march queries only the
coarse-valid rays of each refine level (plus valid texture pixels) instead
of the dense lattice (ray_refine._refine_core_compact). ~45% of the
windowed fine rays and texture pixels are coarse-invalid on a typical
body, and the per-point query is the rotated frame's dominant cost
(DESIGN.md rotated ledger), so the save should be material.

  A. rotated march, dense per-point queries (shipped r3)
  B. rotated march, compact_rotated=0.625
  C. frontal grid frame, same session (reference point)

Usage: python scripts/profile_compact_rotated.py   (TPU; compiles ride
the persistent cache on re-runs).
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
            use_grid, iters=40):
    def frame(params_g, params_c, img):
        return engine._frame_impl(params_g, params_c, img,
                                  img if netC is not None else None,
                                  calib, use_taps=use_taps,
                                  use_grid=use_grid)

    fps, lower = bench.marginal_frame_rate(frame, params_g, params_c,
                                           image, iters)
    return round(fps, 2), round(lower, 2)


def main():
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)

    out = {"canary_tflops_bf16_pre": round(bench.canary_tflops(), 1)}
    real = bench._build_real()
    assert real is not None, "committed weights required"
    netG, params_g, netC, params_c, engine = real

    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    front = jnp.eye(4, dtype=jnp.float32)[None]
    assert not engine._calib_taps_ok(rot)

    t0 = time.time()
    engine.compact_rotated = None     # A: dense, regardless of the default
    out["rotated_dense_fps"], out["rotated_dense_fps_lower"] = measure(
        engine, netC, params_g, params_c, image, rot, False, False)
    print("A rotated dense:", out["rotated_dense_fps"], flush=True)

    eng_b = bench._build_real()[4]
    eng_b.compact_rotated = 0.625
    out["rotated_compact_fps"], out["rotated_compact_fps_lower"] = measure(
        eng_b, netC, params_g, params_c, image, rot, False, False)
    print("B rotated compact:", out["rotated_compact_fps"], flush=True)

    # quality spot-check: compact vs dense on this very frame
    out_d = engine._frame(params_g, params_c, image, image, rot,
                          use_taps=False, use_grid=False)
    out_c = eng_b._frame(params_g, params_c, image, image, rot,
                         use_taps=False, use_grid=False)
    vd = np.asarray(out_d["valid"])
    vc = np.asarray(out_c["valid"])
    out["valid_mismatch_frac"] = round(float((vd != vc).mean()), 5)
    both = vd & vc
    dd = np.abs(np.asarray(out_d["depth"])[both]
                - np.asarray(out_c["depth"])[both])
    out["depth_mismatch_frac_1e3"] = round(float((dd > 1e-3).mean()), 5)
    out["tex_mad"] = round(float(np.abs(
        np.asarray(out_d["render_tex"])
        - np.asarray(out_c["render_tex"])).mean()), 5)

    out["frontal_grid_fps"], _ = measure(
        engine, netC, params_g, params_c, image, front, True, True)
    print("C frontal grid:", out["frontal_grid_fps"], flush=True)

    out["canary_tflops_bf16_post"] = round(bench.canary_tflops(), 1)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
