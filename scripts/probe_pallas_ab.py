"""TPU A/B: do the OCCUPANCY Pallas kernels still earn their keep?

probe_tex_headpath.py found the netC texture head's pallas_call costing
~7.4 ms/frame of pure overhead vs the XLA flax head (now shipped off,
texture.pallas_head=False). Same question for everything else that
use_pallas gates — the frontal taps/grid program's fused ray kernel and
the rotated anchored kernel — at the CURRENT shipped program shape
(they were last A/B'd end-to-end in r2/r3; the program has changed
around them since). Bracketed same-session marginal-rate A/B, trained
weights:

  frontal: production frontal frame (use_taps + use_grid), pallas on/off
  rotated: production anchored rotated frame at the 0.5 ceiling, on/off

Usage: python scripts/probe_pallas_ab.py
"""

import dataclasses
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
    from monoport_tpu.engine import ReconEngine
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)

    real = bench._build_real()
    assert real is not None, "committed weights required"
    netG, params_g, netC, params_c, engine = real
    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    front = jnp.eye(4, dtype=jnp.float32)[None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    out = {"canary_pre": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)

    def mk(use_pallas):
        return ReconEngine(netG, netC, recon=engine.recon,
                           config=dataclasses.replace(engine.config,
                                                      use_pallas=use_pallas))

    def run(eng, label, calib, use_taps, use_grid):
        rot_k = (eng._rot_anchor_plan(calib, 512)
                 if not use_taps else ())

        def frame_fn(pg, pc, img):
            return eng._frame_impl(pg, pc, img, img, calib,
                                   use_taps=use_taps, use_grid=use_grid,
                                   rot_k=rot_k)

        fps, lower = bench.marginal_frame_rate(frame_fn, params_g, params_c,
                                               image, iters=40)
        out[label] = round(fps, 2)
        out[label + "_lower"] = round(lower, 2)
        print(label, out[label], flush=True)

    on, off = mk(True), mk(False)
    run(on, "frontal_pallas_fps", front, True, True)
    run(off, "frontal_xla_fps", front, True, True)
    run(on, "frontal_pallas2_fps", front, True, True)   # drift bracket
    run(on, "rotated_pallas_fps", rot, False, False)
    run(off, "rotated_xla_fps", rot, False, False)
    run(on, "rotated_pallas2_fps", rot, False, False)

    # parity stats (both paths are the same arithmetic, bf16 vs XLA mix)
    f_on = on.frame(params_g, image, params_c, image, calib=front)
    f_off = off.frame(params_g, image, params_c, image, calib=front)
    out["frontal_valid_mismatch"] = int(
        (np.asarray(f_on["valid"]) != np.asarray(f_off["valid"])).sum())
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
