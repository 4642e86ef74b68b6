"""TPU probe: where do the rotated frame's ~9.6 texture-stage ms go?

The stage ledger (profile_stages_rot.py) attributes 9.6 ms to the
compacted per-point texture, but same-session micro-probes put the
512-ch 4-tap gathers at ~0.3 ms and the fused netC head at well under
1 ms for the 18432 compacted pixels. This probe times, in ONE session:

  A. the full production rotated frame (reference point)
  B. the same frame with netC disabled (no cfilter, no texture)
  C. standalone: the compacted `_texture_canvas` on frozen maps
  D. standalone: `query_color` (projection + gathers + fused head) on
     the 18432-point batch alone

Usage: python scripts/probe_tex_rot.py
"""

import functools
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from monoport_tpu.utils.compile_cache import enable as _enable

_enable()

import bench  # noqa: E402


def timed(fn, *args, iters=30):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(a0, rest, n):
        def body(_, a0):
            out = fn(a0, *rest)
            # consume EVERY leaf: a single-leaf carry lets XLA dead-code
            # the rest of the frame (measured: full frame == no-netC frame
            # until this summed over all outputs)
            acc = sum(leaf.reshape(-1)[0].astype(a0.dtype)
                      for leaf in jax.tree.leaves(out))
            return a0 + acc * 1e-12
        return jax.lax.fori_loop(0, n, body, a0)

    for n in (iters, 2 * iters):
        _ = np.asarray(loop(args[0], args[1:], n).reshape(-1)[0])
    t = {}
    for n in (iters, 2 * iters):
        t0 = time.time()
        _ = np.asarray(loop(args[0], args[1:], n).reshape(-1)[0])
        t[n] = time.time() - t0
    return round((t[2 * iters] - t[iters]) / iters * 1000.0, 3)


def main():
    from monoport_tpu.recon.calib import pifu_calib
    from monoport_tpu.render.camera import orbit_extrinsic
    from monoport_tpu.training.datasets.capsule import (render_front,
                                                        skeleton3d)

    out = {"canary": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)
    real = bench._build_real()
    assert real is not None
    netG, params_g, netC, params_c, engine = real
    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    rot = jnp.asarray(pifu_calib(orbit_extrinsic(20.0, 10.0),
                                 np.eye(4, dtype=np.float32)))
    plan = engine._rot_anchor_plan(rot, 512)

    def frame_full(pg, pc, img):
        return engine._frame_impl(pg, pc, img, img, rot, use_taps=False,
                                  use_grid=False, rot_k=plan)

    def frame_notex(pg, img):
        return engine._frame_impl(pg, None, img, None, rot, use_taps=False,
                                  use_grid=False, rot_k=plan)

    out["A_full_ms"] = timed(lambda img: frame_full(params_g, params_c,
                                                    img), image)
    print("A", out["A_full_ms"], flush=True)
    out["B_notex_ms"] = timed(lambda img: frame_notex(params_g, img), image)
    print("B", out["B_notex_ms"], flush=True)

    # frozen maps for the standalone texture
    maps_out = engine.frame(params_g, image, params_c, image, calib=rot)
    from monoport_tpu.recon.ray_refine import SurfaceMaps
    maps = SurfaceMaps(depth=jnp.asarray(maps_out["depth"]),
                       normal=jnp.zeros((257, 257, 3), jnp.float32),
                       valid=jnp.asarray(maps_out["valid"]))

    pg_c = engine._cast(params_g)
    pc_c = engine._cast(params_c)
    img_c = engine._cast(image)
    feats_c = netC.apply(pc_c, img_c,
                         netG.apply(pg_c, img_c, method="filter")[-1][-1],
                         method="filter")
    feats_c = engine._feats_f32(feats_c)
    head_c = engine._head_fn(netC, pc_c)

    def query_color(pts):
        return netC.apply(pc_c, feats_c, pts, rot, method="query",
                          head_fn=head_c)[0]

    def tex_canvas(depth, valid):
        m = SurfaceMaps(depth=depth, normal=maps.normal, valid=valid)
        return engine._texture_canvas(m, 257, query_color=query_color,
                                      compact=engine.compact_rotated)

    out["C_texcanvas_ms"] = timed(tex_canvas, maps.depth, maps.valid)
    print("C", out["C_texcanvas_ms"], flush=True)

    pts = jax.random.uniform(jax.random.PRNGKey(0), (1, 18432, 3),
                             minval=-0.8, maxval=0.8)
    out["D_querycolor_ms"] = timed(query_color, pts)
    print("D", out["D_querycolor_ms"], flush=True)

    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
