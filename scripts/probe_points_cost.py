"""TPU cost-attribution probe: does the rotated frame's time scale with
its per-point query count at all?

Evidence so far is contradictory: compaction 0.625 -> 0.5 (26% fewer
points) bought +1.9 fps, yet bf16 gathers, patch gathers and the
standalone texture/query decomposition all say the per-point work is
cheap. This probe halves/quarters the compaction budget (0.5 -> 0.25 ->
0.125), which shrinks BOTH the refine and texture query batches with
zero code-path change. Output quality degrades at low budgets (rays
drop) — this is NOT a shipping candidate, purely dC/dN measurement:

  - if fps rises steeply, per-point count drives the frame -> a strided
    color lattice / tighter windows are worth building (r5);
  - if fps barely moves, the texture/refine stages are fixed-overhead
    (layout + small-op latency) and ~37 fps is the structural floor of
    this program shape.

Usage: python scripts/probe_points_cost.py
"""

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

    def run(budget, label):
        eng = ReconEngine(netG, netC, recon=engine.recon,
                  config=EngineCfg.flat(mode="ray", fine_res=257,
                                        ray_taps=engine.ray_taps,
                                        ray_window=engine.ray_window,
                                        compute_dtype=jnp.bfloat16,
                                        use_pallas=True,
                                        march_levels=engine.march_levels,
                                        march_rotated=True, rot_anchors="auto",
                                        compact_rotated=budget))
        plan = eng._rot_anchor_plan(rot, 512)

        def frame_fn(pg, pc, img):
            return eng._frame_impl(pg, pc, img, img, rot, use_taps=False,
                                   use_grid=False, rot_k=plan)

        fps, lower = bench.marginal_frame_rate(frame_fn, params_g, params_c,
                                               image, iters=40)
        out[label] = round(fps, 2)
        print(label, out[label], flush=True)
        o = eng.frame(params_g, image, params_c, image, calib=rot)
        dropped = o.get("compact_dropped")
        out[label + "_dropped"] = (np.asarray(dropped).tolist()
                                   if dropped is not None else None)

    run(0.5, "c50_fps")      # shipped default (reference point)
    run(0.25, "c25_fps")
    run(0.125, "c12_fps")
    run(0.5, "c50b_fps")     # bracket session drift
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
