"""Per-stage cost ledger for the ROTATED frame program (per-point march +
anchored/compacted refines + compacted texture) on the real chip.

Nested stage prefixes of the production engine._frame_impl (stage=
'filter' | 'recon' | 'shade' | 'cfilter' | full), marginal-rate N vs 2N
chains, chip canary. Differences give ms per stage; pair with
scripts/roofline_stages.py (per-stage GFLOP/GB from the XLA cost model)
for achieved TFLOP/s + binding resource in DESIGN.md.

Run on TPU:  python scripts/profile_stages_rot.py [--pp]
  --pp: exact per-point refines (rot_k=()) instead of the anchored plan.
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

import bench  # noqa: E402


def main():
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
    plan = () if "--pp" in sys.argv else engine._rot_anchor_plan(rot, 512)
    print(json.dumps({"anchor_plan": str(plan),
                      "canary_tflops_bf16": round(bench.canary_tflops(),
                                                  1)}), flush=True)

    @functools.partial(jax.jit, static_argnames=("n", "stage"))
    def loop(params_g, params_c, img, n, stage):
        def body(_, img):
            out = engine._frame_impl(params_g, params_c, img, img, rot,
                                     use_taps=False, use_grid=False,
                                     rot_k=plan, stage=stage)
            return img + out["mask"].astype(jnp.float32).sum() * 1e-12
        return jax.lax.fori_loop(0, n, body, img)

    iters = 60
    ms = {}
    stages = ["filter", "recon", "shade", "cfilter", None]
    for stage in stages:
        for n in (iters, 2 * iters):
            _ = np.asarray(loop(params_g, params_c, image, n,
                                stage)[0, 0, 0, 0])

        def run_n(n, stage=stage):
            _ = np.asarray(loop(params_g, params_c, image, n,
                                stage)[0, 0, 0, 0])

        fps, fps_lower = bench.measure_fps(run_n, iters)
        label = stage or "tex"
        ms[label] = 1000.0 / fps
        print(json.dumps({"prefix": label,
                          "ms_per_frame": round(1000.0 / fps, 2),
                          "fps": round(fps, 1),
                          "fps_incl_overhead": round(fps_lower, 1)}),
              flush=True)

    ledger, prev = {}, 0.0
    for label in ms:
        ledger[label] = round(ms[label] - prev, 2)
        prev = ms[label]
    print(json.dumps({"stage_ms": ledger, "total_ms": round(prev, 2),
                      "canary_tflops_bf16": round(bench.canary_tflops(),
                                                  1)}), flush=True)


if __name__ == "__main__":
    main()
