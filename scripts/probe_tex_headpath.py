"""TPU A/B: what carries the rotated texture stage's FIXED ~7 ms?

After r4's dead ends (addressing, bytes, dtype) and r5's stride probe
(quartering the queried points buys only ~1.3 fps -> dC/dN is shallow),
the stage cost is mostly POINT-COUNT-INDEPENDENT. Remaining suspects:
(a) the Pallas fused netC head call itself (pallas_call scheduling /
tile inefficiency at the texture shape) vs the XLA flax head;
(b) the netC query's everything-else (feats upcast, normalizer, calib
projection) — approximated by a no-texture frame.

Bracketed same-session A/B on the full production rotated frame at the
0.5 ceiling: pallas head (shipped) / XLA head (monkeypatched netC head
only; netG keeps its kernels) / no netC at all.

Usage: python scripts/probe_tex_headpath.py
"""

import json
import os
import sys
import types

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

    def mk(with_c=True, xla_chead=False):
        eng = ReconEngine(netG, netC if with_c else None, recon=engine.recon,
                  config=EngineCfg.flat(mode="ray", fine_res=257,
                                        ray_taps=engine.ray_taps,
                                        ray_window=engine.ray_window,
                                        compute_dtype=jnp.bfloat16,
                                        use_pallas=True,
                                        march_levels=engine.march_levels,
                                        march_rotated=True,
                                        rot_anchors=engine.rot_anchors,
                                        compact_rotated=engine.compact_rotated))
        if xla_chead:
            orig = type(eng)._head_fn

            def patched(self, net, params):
                if net is self.netC:
                    return None          # flax/XLA head for netC only
                return orig(self, net, params)

            eng._head_fn = types.MethodType(patched, eng)
        return eng

    def run(eng, label, with_c=True):
        plan = eng._rot_anchor_plan(rot, 512)

        def frame_fn(pg, pc, img):
            return eng._frame_impl(pg, pc if with_c else None, img,
                                   img if with_c else None, rot,
                                   use_taps=False, use_grid=False,
                                   rot_k=plan)

        fps, lower = bench.marginal_frame_rate(frame_fn, params_g, params_c,
                                               image, iters=40)
        out[label] = round(fps, 2)
        out[label + "_lower"] = round(lower, 2)
        print(label, out[label], flush=True)

    run(mk(), "pallas_chead_fps")
    run(mk(xla_chead=True), "xla_chead_fps")
    run(mk(), "pallas_chead2_fps")                 # drift bracket
    run(mk(with_c=False), "no_netc_fps", with_c=False)

    # output parity between the two head paths (bf16 kernel vs XLA f32
    # mix — close, not bit-identical)
    m_p = mk().frame(params_g, image, params_c, image, calib=rot)
    m_x = mk(xla_chead=True).frame(params_g, image, params_c, image,
                                   calib=rot)
    tp, tx = np.asarray(m_p["render_tex"]), np.asarray(m_x["render_tex"])
    mask = np.asarray(m_p["mask"])
    mask = (mask[..., 0] if mask.ndim == 3 else mask) > 0.5
    out["tex_mad_pallas_vs_xla"] = round(float(np.abs(tp - tx)[mask].mean()), 6)
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
