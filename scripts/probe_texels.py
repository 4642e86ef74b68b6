"""TPU sweep: rot_anchor_texels tolerance vs rotated-frame fps.

At the shipped 1.0 the orbit calib plans (None, 4): the MID refine level
stays exact per-point (its chord spans > taps texels). Looser tolerances
anchor it too — 1.5 plans (5, 3), 2.0 plans (4, 3), 3.0 plans (3, 2) —
replacing its per-point fused head with the cheaper anchored kernel and
cutting gathers. Deviation grows with the per-segment texel span; pair
this fps sweep with scripts/eval_rotated_anchored.py --texels at the
winning setting before shipping a default change.

Usage: python scripts/probe_texels.py
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

    outs = {}

    def run(tx, label):
        eng = ReconEngine(netG, netC, recon=engine.recon,
                  config=EngineCfg.flat(mode="ray", fine_res=257,
                                        ray_taps=engine.ray_taps,
                                        ray_window=engine.ray_window,
                                        compute_dtype=jnp.bfloat16,
                                        use_pallas=True,
                                        march_levels=engine.march_levels,
                                        march_rotated=True, rot_anchors="auto",
                                        rot_anchor_texels=tx,
                                        compact_rotated=engine.compact_rotated))
        plan = eng._rot_anchor_plan(rot, 512)

        def frame_fn(pg, pc, img):
            return eng._frame_impl(pg, pc, img, img, rot, use_taps=False,
                                   use_grid=False, rot_k=plan)

        fps, lower = bench.marginal_frame_rate(frame_fn, params_g, params_c,
                                               image, iters=40)
        out[label] = round(fps, 2)
        out[label + "_plan"] = str(plan)
        print(label, out[label], plan, flush=True)
        outs[label] = eng.frame(params_g, image, params_c, image, calib=rot)

    run(1.0, "tx10_fps")              # shipped default (reference point)
    run(1.5, "tx15_fps")
    run(2.0, "tx20_fps")
    run(3.0, "tx30_fps")
    run(1.0, "tx10b_fps")             # bracket session drift

    # deviation vs the shipped 1.0 output (same session, same body)
    base = outs["tx10_fps"]
    vb = np.asarray(base["valid"]) > 0.5
    db = np.asarray(base["depth"])
    tb = np.asarray(base["render_tex"])
    for label in ("tx15_fps", "tx20_fps", "tx30_fps"):
        o = outs[label]
        v = np.asarray(o["valid"]) > 0.5
        both = vb & v
        out[label + "_valid_mismatch"] = round(
            float((vb != v).mean()), 6)
        out[label + "_depth_mad"] = round(
            float(np.abs(db - np.asarray(o["depth"]))[both].mean()), 5)
        out[label + "_tex_mad"] = round(float(np.abs(
            tb - np.asarray(o["render_tex"])).mean()), 6)
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
