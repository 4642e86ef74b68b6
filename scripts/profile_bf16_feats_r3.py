"""bf16 feature maps re-probed on the R3 GRID program, one TPU session.

History (DESIGN.md dtype policy): f32 feature maps at the query boundary
were (r1) a workaround for a TPU register-allocator crash on big bf16
gather+GEMM programs, then (r2) a measured choice — the ray kernel's
gather batch is latency/addressing-bound, so halving its traffic with
bf16 lost to the boundary casts (33.2 vs 37.5 fps). The r3 frame program
changed the premise: march levels, fine window AND texture all sample via
SEPARABLE MATMULS (ops/sampling.index_grid) — the feature traffic is now
dense MXU work where bf16 halves both HBM bytes and MXU cycles, and the
crash-prone big gather is gone entirely.

This measures the official synthetic frame program (bench.build_frame)
with f32 vs bf16 feature maps in one session. Run from the repo root.
"""

import json
import sys

import numpy as np

import jax

sys.path.insert(0, ".")

from monoport_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

import bench  # noqa: E402

def measure_frame(iters=60):
    frame_impl, params_g, params_c, image, calib, engine = bench.build_frame()

    def frame(params_g, params_c, img):
        return frame_impl(params_g, params_c, img, img, calib)

    fps, lower = bench.marginal_frame_rate(frame, params_g, params_c,
                                           image, iters)
    return round(fps, 2), round(lower, 2)

def main():
    assert bench._MARCH, "r3 A/B expects the march program"
    out = {"canary_tflops_bf16_pre": round(bench.canary_tflops(), 1)}

    bench._BF16_FEATS = False
    out["f32_feats_fps"], _ = measure_frame()
    print("f32 feats:", out["f32_feats_fps"], flush=True)

    bench._BF16_FEATS = True
    try:
        out["bf16_feats_fps"], _ = measure_frame()
    except Exception as e:  # noqa: BLE001
        out["bf16_feats_error"] = repr(e)[:300]
    print("bf16 feats:", out.get("bf16_feats_fps",
                                 out.get("bf16_feats_error")), flush=True)

    out["canary_tflops_bf16_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out))

if __name__ == "__main__":
    main()
