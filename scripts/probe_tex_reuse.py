"""TPU A/B: rotated texture query riding the final refine's compaction.

Hypothesis (DESIGN.md r4 roofline + dead ends): the rotated texture
stage's in-frame cost is small-op/scheduling latency — window derivation,
valid resample, flatnonzero compaction — not gathers or MLP FLOPs (bf16
feats and patch-gather both measured no-ops). tex_reuse_compact removes
exactly those ops: the color query runs at the final refine level's
already-gathered ray set and refined depths (engine._texture_canvas
``reuse``), same budget, colors bit-identical at stride 1
(tests/test_compact_rays.py::test_texture_reuses_refine_compaction).

Same-session bracketed A/B on the full production rotated frame (trained
weights, orbit yaw 20 / pitch 10), at the fixed 0.5 ceiling AND at the
0.25 adaptive rung the bench body runs (both matter: the ceiling is
rotated_fps, the rung is rotated_adaptive_fps).

Usage: python scripts/probe_tex_reuse.py
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
    assert engine.tex_reuse_compact          # shipped default = reuse on
    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    out = {"canary_pre": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)

    def mk(reuse):
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
                                         tex_reuse_compact=reuse))

    eng_re, eng_in = mk(True), mk(False)

    def run(eng, label, budget=None):
        plan = eng._rot_anchor_plan(rot, 512)

        def frame_fn(pg, pc, img):
            return eng._frame_impl(pg, pc, img, img, rot, use_taps=False,
                                   use_grid=False, rot_k=plan,
                                   compact_budget=budget)

        fps, lower = bench.marginal_frame_rate(frame_fn, params_g, params_c,
                                               image, iters=40)
        out[label] = round(fps, 2)
        out[label + "_lower"] = round(lower, 2)
        print(label, out[label], flush=True)

    # fixed 0.5 ceiling (the bench's rotated_fps program)
    run(eng_in, "A_indep_fps")
    run(eng_re, "B_reuse_fps")
    run(eng_in, "A2_indep_fps")          # bracket session drift
    # 0.25 adaptive rung (the bench body's snapped program)
    run(eng_in, "A_indep_r25_fps", budget=0.25)
    run(eng_re, "B_reuse_r25_fps", budget=0.25)
    run(eng_in, "A2_indep_r25_fps", budget=0.25)

    # output deviation at the production shape (trained weights)
    m_r = eng_re.frame(params_g, image, params_c, image, calib=rot)
    m_i = eng_in.frame(params_g, image, params_c, image, calib=rot)
    tr, ti = np.asarray(m_r["render_tex"]), np.asarray(m_i["render_tex"])
    mask = np.asarray(m_r["mask"])
    mask = (mask[..., 0] if mask.ndim == 3 else mask) > 0.5
    out["tex_mad"] = round(float(np.abs(tr - ti)[mask].mean()), 6)
    out["tex_maxdiff"] = round(float(np.abs(tr - ti)[mask].max()), 6)
    out["valid_mismatch"] = int(
        (np.asarray(m_r["valid"]) != np.asarray(m_i["valid"])).sum())
    out["dropped"] = np.asarray(m_r["compact_dropped"]).tolist()
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
