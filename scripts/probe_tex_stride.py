"""TPU A/B: dense strided color lattice for the rotated texture stage.

The r4 roofline closed on the rotated texture stage as small-op latency
(6.5 TF/s, 3% peak, 9.6 ms) whose measured cost scales with the queried
POINT COUNT (probe_points_cost.py: ~3 ms per 9k points), not with
gathers, bytes or MLP FLOPs (three recorded dead ends). texture.stride=2
restructures the query itself (engine._texture_canvas): one dense
(window/2)^2 grid — 9.2k points instead of up to 18.4k compacted ones —
with NO valid resample / flatnonzero / scatter at all, bilinearly
upsampled back to the ray lattice. Geometry is untouched by
construction (tests/test_compact_rays.py::
test_texture_stride_close_and_geometry_untouched).

Bracketed same-session A/B on the full production rotated frame (trained
weights, orbit yaw 20 / pitch 10) at the fixed 0.5 ceiling and the 0.25
adaptive rung, plus color-deviation stats vs the exact stride-1 output.

Usage: python scripts/probe_tex_stride.py [--strides 2 3]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from monoport_tpu.utils.compile_cache import enable as _enable  # noqa: E402

_enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--strides", type=int, nargs="*", default=[2])
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()

    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)

    real = bench._build_real()
    assert real is not None, "committed weights required"
    netG, params_g, netC, params_c, engine = real
    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    out = {"canary_pre": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)

    def mk(stride):
        return ReconEngine(netG, netC, recon=engine.recon,
                   config=EngineCfg.flat(mode="ray", fine_res=257,
                                         ray_taps=engine.ray_taps,
                                         ray_window=engine.ray_window,
                                         compute_dtype=jnp.bfloat16,
                                         use_pallas=True,
                                         march_levels=engine.march_levels,
                                         march_rotated=True,
                                         rot_anchors=engine.rot_anchors,
                                         compact_rotated=engine.compact_rotated,
                                         tex_stride=stride))

    engines = {1: mk(1)}
    for s in args.strides:
        engines[s] = mk(s)

    def run(eng, label, budget=None):
        plan = eng._rot_anchor_plan(rot, 512)

        def frame_fn(pg, pc, img):
            return eng._frame_impl(pg, pc, img, img, rot, use_taps=False,
                                   use_grid=False, rot_k=plan,
                                   compact_budget=budget)

        fps, lower = bench.marginal_frame_rate(frame_fn, params_g, params_c,
                                               image, iters=args.iters)
        out[label] = round(fps, 2)
        out[label + "_lower"] = round(lower, 2)
        print(label, out[label], flush=True)

    # fixed 0.5 ceiling (the bench's rotated_fps program)
    run(engines[1], "s1_fps")
    for s in args.strides:
        run(engines[s], f"s{s}_fps")
    run(engines[1], "s1b_fps")           # bracket session drift
    # 0.25 adaptive rung (the bench body's snapped program)
    run(engines[1], "s1_r25_fps", budget=0.25)
    for s in args.strides:
        run(engines[s], f"s{s}_r25_fps", budget=0.25)
    run(engines[1], "s1b_r25_fps", budget=0.25)

    # color deviation vs the exact stride-1 output (trained weights)
    m1 = engines[1].frame(params_g, image, params_c, image, calib=rot)
    t1 = np.asarray(m1["render_tex"])
    mask = np.asarray(m1["mask"])
    mask = (mask[..., 0] if mask.ndim == 3 else mask) > 0.5
    for s in args.strides:
        ms = engines[s].frame(params_g, image, params_c, image, calib=rot)
        ts = np.asarray(ms["render_tex"])
        d = np.abs(ts - t1)[mask]
        out[f"s{s}_tex_mad"] = round(float(d.mean()), 6)
        out[f"s{s}_tex_p99"] = round(float(np.quantile(d, 0.99)), 6)
        out[f"s{s}_tex_max"] = round(float(d.max()), 6)
        out[f"s{s}_valid_mismatch"] = int(
            (np.asarray(ms["valid"]) != np.asarray(m1["valid"])).sum())
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
