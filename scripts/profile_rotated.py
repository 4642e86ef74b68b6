"""Rotated-view (free-viewpoint) path A/B on the real chip, one session.

The demo's orbit camera (RTL/scene.py:122-137) rotates the view extrinsic,
putting z-terms in the calib's image rows: every taps/grid-structured fast
path is off and the frame runs on the exact per-point query. r3 change
under test: march_rotated — the volume-free ray-march pyramid now also
runs on rotated calibs (engine.py), replacing the coarse hierarchy +
depth peel. This script measures, in ONE session (CLAUDE.md: compare A/B
only within a session):

  A. rotated frame, hierarchy fallback (r2 behavior, march_rotated=False)
  B. rotated frame, per-point march pyramid (r3, march_rotated=True)
  C. frontal frame (grid path) for the same-session reference point

Usage: python scripts/profile_rotated.py  (on the TPU; ~10 min incl.
compiles, which ride the persistent cache on re-runs).
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
    # B first (the shipped path), then A (flip the flag), then C
    engine.march_rotated = True
    out["rotated_march_fps"], out["rotated_march_fps_lower"] = measure(
        engine, netC, params_g, params_c, image, rot, False, False)
    print("B rotated march:", out["rotated_march_fps"], flush=True)

    eng_a = bench._build_real()[4]
    eng_a.march_rotated = False
    out["rotated_hierarchy_fps"], out["rotated_hierarchy_fps_lower"] = \
        measure(eng_a, netC, params_g, params_c, image, rot, False, False)
    print("A rotated hierarchy:", out["rotated_hierarchy_fps"], flush=True)

    out["frontal_grid_fps"], _ = measure(
        engine, netC, params_g, params_c, image, front, True, True)
    print("C frontal grid:", out["frontal_grid_fps"], flush=True)

    out["canary_tflops_bf16_post"] = round(bench.canary_tflops(), 1)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
