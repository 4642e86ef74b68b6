"""TPU A/B: bf16 netC feature maps for the ROTATED per-point texture.

Hypothesis (roofline table, DESIGN.md round-4): the rotated texture
stage is latency/materialization-bound — feats_c is cast f32 and
materialized at 33 MB solely to feed ~18k 512-ch row gathers, while
bf16 row gathers measured 3.5x faster in isolation
(scripts/probe_patch_gather.py). engine(tex_bf16=True) skips the f32
cast on the per-point texture path only.

Same-session A/B on the full production rotated frame (trained weights,
orbit yaw 20 / pitch 10), plus color deviation between the variants.

Usage: python scripts/probe_tex_bf16.py
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

    eng_b = ReconEngine(netG, netC, recon=engine.recon,
                config=EngineCfg.flat(mode="ray", fine_res=257,
                                      ray_taps=engine.ray_taps,
                                      ray_window=engine.ray_window,
                                      compute_dtype=jnp.bfloat16,
                                      use_pallas=True,
                                      march_levels=engine.march_levels,
                                      march_rotated=True,
                                      rot_anchors=engine.rot_anchors,
                                      compact_rotated=engine.compact_rotated,
                                      tex_bf16=True))

    def run(eng, label):
        plan = eng._rot_anchor_plan(rot, 512)

        def frame_fn(pg, pc, img):
            return eng._frame_impl(pg, pc, img, img, rot, use_taps=False,
                                   use_grid=False, rot_k=plan)

        fps, lower = bench.marginal_frame_rate(frame_fn, params_g, params_c,
                                               image, iters=40)
        out[label] = round(fps, 2)
        out[label + "_lower"] = round(lower, 2)
        print(label, out[label], flush=True)

    run(engine, "A_f32_fps")          # shipped default
    run(eng_b, "B_bf16_fps")
    run(engine, "A2_f32_fps")         # re-run A: bracket session drift

    # color deviation between variants (identical geometry by design)
    m_a = engine.frame(params_g, image, params_c, image, calib=rot)
    m_b = eng_b.frame(params_g, image, params_c, image, calib=rot)
    ta, tb = np.asarray(m_a["render_tex"]), np.asarray(m_b["render_tex"])
    mask = np.asarray(m_a["mask"])
    mask = (mask[..., 0] if mask.ndim == 3 else mask) > 0.5
    out["tex_mad"] = round(float(np.abs(ta - tb)[mask].mean()), 6)
    out["tex_maxdiff"] = round(float(np.abs(ta - tb)[mask].max()), 6)
    out["valid_mismatch"] = int(
        (np.asarray(m_a["valid"]) != np.asarray(m_b["valid"])).sum())
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
