"""TPU probe: cost of a PERSPECTIVE-projection config (VERDICT r3 item 7).

The reference treats perspective as a first-class projection
(/root/reference/monoport/lib/modeling/geometry.py:37-55). In this
rebuild a perspective net cannot use the frontal taps/grid fast paths
(the z-divide moves u,v per tap), but since r4 it RIDES THE ANCHORED
MARCH: a ray's uv path is still a straight image-space chord under
perspective, so the K-anchor lerp form applies with per-tap alpha from
the projected endpoints (engine._rot_anchor_plan, tests/test_anchored.py
::test_engine_perspective_rides_anchored_march).

This probe measures, in ONE session, frame rates at the production
shapes (512 input, 257 rays, trained-shape random weights):

  A. orthogonal config, frontal grid path   (the bench headline path)
  B. orthogonal config, rotated anchored    (free-viewpoint reference)
  C. perspective config, anchored march     (what this probe is for)
  D. perspective config, r2 hierarchy fallback (march_rotated=False --
     what a perspective frame cost BEFORE r4)

Usage: python scripts/probe_persp.py
Prints one JSON line; paste into DESIGN.md.
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


def build(projection: str, march_rotated: bool = True):
    from monoport_tpu import get_cfg_defaults
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    cfg = get_cfg_defaults()
    cfg.netG.projection = projection
    netG = MonoPortNet(cfg.netG)
    image = jnp.zeros((1, 512, 512, 3), jnp.float32)
    pts = jnp.zeros((1, 1024, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]
    params_g = netG.init(jax.random.PRNGKey(0), image, pts, calib)
    recon = HierarchicalRecon(resolutions=(17, 33, 65),
                              budgets=(0, 4096, 16384), select="uncertain")
    engine = ReconEngine(netG, None, recon=recon,
                 config=EngineCfg.flat(mode="ray", fine_res=257,
                                       ray_taps=bench._RAY_TAPS,
                                       ray_window=bench._RAY_WINDOW,
                                       compute_dtype=jnp.bfloat16,
                                       use_pallas=True,
                                       march_levels=bench._MARCH_LEVELS,
                                       march_rotated=march_rotated,
                                       rot_anchors=bench._ROT_ANCHORS))
    return engine, params_g


def persp_calib():
    """A real z-divide intrinsic: subject 3 units in front of the camera
    (homo z in [2, 4]), unit focal — the geometry.py:37-55 convention and
    tests/test_anchored.py's PERSP_CALIB regime. Measured anchor plan at
    this calib: (None, 3) — the fine refine level anchors at K=3.
    (A focal-2.2 z-2.4 close-up calib measured (None, None): chords blow
    past taps texels and every level stays exact per-point — the plan
    degrades gracefully with camera aggressiveness.)"""
    c = np.eye(4, dtype=np.float32)
    c[2, 3] = 3.0          # push the volume in front of the camera
    return jnp.asarray(c)[None]


def measure(engine, params_g, calib, **frame_kw):
    image = jnp.zeros((1, 512, 512, 3), jnp.float32)

    def frame_fn(pg, pc, img):
        return engine._frame_impl(pg, pc, img, None, calib, **frame_kw)

    fps, lower = bench.marginal_frame_rate(frame_fn, params_g, None, image,
                                           iters=40)
    return round(fps, 2), round(lower, 2)


def main():
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic

    out = {"canary_pre": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)

    ortho, pg_o = build("orthogonal")
    eye = jnp.eye(4, dtype=jnp.float32)[None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))

    out["A_ortho_frontal_fps"] = measure(ortho, pg_o, eye,
                                         use_taps=True, use_grid=True)
    print("A", out["A_ortho_frontal_fps"], flush=True)
    plan_o = ortho._rot_anchor_plan(rot, 512)
    out["B_ortho_rotated_fps"] = measure(ortho, pg_o, rot, use_taps=False,
                                         use_grid=False, rot_k=plan_o)
    print("B", out["B_ortho_rotated_fps"], flush=True)

    persp, pg_p = build("perspective")
    pc = persp_calib()
    plan_p = persp._rot_anchor_plan(pc, 512)
    out["persp_anchor_plan"] = str(plan_p)
    out["C_persp_anchored_fps"] = measure(persp, pg_p, pc, use_taps=False,
                                          use_grid=False, rot_k=plan_p)
    print("C", out["C_persp_anchored_fps"], flush=True)

    persp_h, _ = build("perspective", march_rotated=False)
    out["D_persp_hierarchy_fps"] = measure(persp_h, pg_p, pc,
                                           use_taps=False, use_grid=False,
                                           rot_k=())
    print("D", out["D_persp_hierarchy_fps"], flush=True)

    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
