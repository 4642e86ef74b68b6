"""Clip-size sweep of the batched video mode (BASELINE config #4), one
session: frames-mode throughput at clip sizes 8/16/32 plus the single-
frame reference — where does the batch axis saturate the chip?

Run on TPU:  python scripts/profile_frames_sweep.py
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

import bench  # noqa: E402


def main():
    out = {"canary_tflops_bf16_pre": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)
    real = bench._build_real()
    assert real is not None, "committed weights required"
    netG, params_g, netC, params_c, engine = real

    t0 = time.time()
    # single-frame reference (same session)
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)
    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    def frame(params_g, params_c, img):
        return engine._frame_impl(params_g, params_c, img,
                                  img if netC is not None else None,
                                  calib, use_taps=True, use_grid=True)

    fps1, _ = bench.marginal_frame_rate(frame, params_g, params_c, image,
                                        40)
    out["single_fps"] = round(fps1, 2)
    print("single:", out["single_fps"], flush=True)

    for clip, iters in ((8, 8), (16, 5), (32, 3)):
        res = bench.bench_frames(real, fps1, clip=clip, iters=iters)
        out[f"clip{clip}_fps"] = res["frames_mode_fps"]
        out[f"clip{clip}_speedup"] = res["frames_mode_speedup_vs_single"]
        print(f"clip {clip}:", res["frames_mode_fps"], flush=True)

    out["canary_tflops_bf16_post"] = round(bench.canary_tflops(), 1)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
