"""Rotated-view compaction BUDGET sweep on the real chip, one session.

profile_compact_rotated.py established compact=0.625 beats dense (+7.8%).
This sweeps tighter budgets (0.5625, 0.5) against the shipped 0.625 to
see whether the remaining per-point query padding is still paying rent.
Overflow degrades to the coarse silhouette (never holes), so the quality
spot-check (valid/depth/tex mismatch vs dense) decides shippability, the
marginal rate decides worth.

Usage: python scripts/profile_compact_sweep.py   (TPU; compiles ride the
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


def measure(engine, netC, params_g, params_c, image, calib, iters=40):
    def frame(params_g, params_c, img):
        return engine._frame_impl(params_g, params_c, img,
                                  img if netC is not None else None,
                                  calib, use_taps=False, use_grid=False)

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
    assert netC is not None, "netc_capsule.npz required (tex spot-check)"

    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    assert not engine._calib_taps_ok(rot)

    t0 = time.time()
    # dense reference output for the quality spot-check. compact_rotated
    # is baked into the trace at compile time: set it BEFORE the first
    # _frame call on this engine (it hasn't been traced yet here), and
    # never reuse this engine for a budgeted run.
    engine.compact_rotated = None
    out_d = engine._frame(params_g, params_c, image, image, rot,
                          use_taps=False, use_grid=False)
    vd = np.asarray(out_d["valid"])

    def fresh_engine(budget):
        # nets/params are reusable; only the ReconEngine (whose jit cache
        # keys on the instance) must be rebuilt per budget
        from monoport_tpu.engine import EngineCfg, ReconEngine
        return ReconEngine(netG, netC, recon=engine.recon,
                   config=EngineCfg.flat(mode="ray", fine_res=engine.fine_res,
                                         ray_taps=engine.ray_taps,
                                         ray_window=engine.ray_window,
                                         compute_dtype=engine.compute_dtype,
                                         use_pallas=engine.use_pallas,
                                         march_levels=engine.march_levels,
                                         march_rotated=engine.march_rotated,
                                         compact_rotated=budget))

    for budget in (0.625, 0.5625, 0.5):
        eng = fresh_engine(budget)
        key = str(budget).replace(".", "p")
        fps, lower = measure(eng, netC, params_g, params_c, image, rot)
        out[f"fps_{key}"] = fps
        out[f"fps_{key}_lower"] = lower
        out_c = eng._frame(params_g, params_c, image, image, rot,
                           use_taps=False, use_grid=False)
        vc = np.asarray(out_c["valid"])
        out[f"valid_mismatch_{key}"] = round(float((vd != vc).mean()), 5)
        both = vd & vc
        out[f"valid_overlap_{key}"] = int(both.sum())
        dd = np.abs(np.asarray(out_d["depth"])[both]
                    - np.asarray(out_c["depth"])[both])
        # fully disjoint valid sets (pathological budget): report the
        # explicit worst case instead of a NaN mean
        out[f"depth_mismatch_{key}"] = (
            round(float((dd > 1e-3).mean()), 5) if both.any() else 1.0)
        out[f"tex_mad_{key}"] = round(float(np.abs(
            np.asarray(out_d["render_tex"])
            - np.asarray(out_c["render_tex"])).mean()), 5)
        print(f"{budget}: {fps} fps, valid mism "
              f"{out[f'valid_mismatch_{key}']}", flush=True)

    out["canary_tflops_bf16_post"] = round(bench.canary_tflops(), 1)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
