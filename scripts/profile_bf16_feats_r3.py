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


def measure_frame(iters=60):
    frame_impl, params_g, params_c, image, calib, engine = bench.build_frame()

    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(params_g, params_c, img, n):
        def body(_, carry):
            img, c = carry
            out = frame_impl(params_g, params_c, img, img, calib)
            return (img + out["mask"].astype(jnp.float32).sum() * 1e-12,
                    out["recon_counts"])
        return jax.lax.fori_loop(
            0, n, body, (img, jnp.zeros((1,), jnp.int32)))

    for n in (iters, 2 * iters):
        out, _ = loop(params_g, params_c, image, n)
        _ = np.asarray(out[0, 0, 0, 0])

    def run_n(n):
        out, _ = loop(params_g, params_c, image, n)
        _ = np.asarray(out[0, 0, 0, 0])

    fps, lower = bench.measure_fps(run_n, iters)
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
