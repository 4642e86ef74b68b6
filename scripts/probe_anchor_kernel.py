"""Standalone TPU probe for the anchored ray-MLP head at the production
rotated-frame shape (compacted 192^2 x 0.625 = 23040 rays, K=3 anchors,
T=6 taps, 256-ch head): which backend/tiling compiles inside the 16 MB
scoped-VMEM budget, and how fast is each.

Variants: Pallas tile_r 128 (shipped; OOMed at 32.91M scoped vmem on the
first real-hardware compile), 64, 32; plain-XLA anchored math; and the
per-point reference cost (apply_ray-style full query at T taps, which the
anchored path replaces).

Usage: python scripts/probe_anchor_kernel.py
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

from monoport_tpu.ops.pallas.fused_mlp import (apply_packed,  # noqa: E402
                                               pack_mlp_params)
from monoport_tpu.ops.pallas.fused_ray_mlp import (  # noqa: E402
    apply_anchor_packed, apply_anchor_xla, infer_head_channels,
    pack_ray_mlp_params)

R, K, T, C = 23040, 3, 6, 256


def head_params():
    from monoport_tpu.utils.params_io import load_params
    params = load_params("monoport_tpu/data/netg_capsule.npz")[0]
    return params["surface_classifier"]


def timed(name, fn, *args, iters=30):
    """Chained on-device loop (dispatch/RTT amortized), per-call ms."""
    try:
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(a0, rest, n):
            def body(_, a0):
                out = fn(a0, *rest)
                return a0 + out.reshape(-1)[0] * 1e-12
            return jax.lax.fori_loop(0, n, body, a0)

        for n in (iters, 2 * iters):
            _ = np.asarray(loop(args[0], args[1:], n).reshape(-1)[0])
        t = {}
        for n in (iters, 2 * iters):
            t0 = time.time()
            _ = np.asarray(loop(args[0], args[1:], n).reshape(-1)[0])
            t[n] = time.time() - t0
        ms = (t[2 * iters] - t[iters]) / iters * 1000.0
        return {"ok": True, "ms": round(ms, 3)}
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "err": str(e)[:300]}


def main():
    out = {"canary": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)
    hp = head_params()
    packed = pack_ray_mlp_params(hp, dtype=jnp.bfloat16)
    kf = jax.random.PRNGKey(0)
    feat_a = jax.random.normal(kf, (1, R, K, C), jnp.float32)
    w = jax.nn.softmax(jax.random.normal(
        jax.random.fold_in(kf, 1), (1, R, T, K)), axis=-1)
    z = jax.random.uniform(jax.random.fold_in(kf, 2), (1, R, T))

    for tile in (256, 128, 64, 32):
        fn = lambda f, w, z, tile=tile: apply_anchor_packed(  # noqa: E731
            packed, f, w, z, last_op="sigmoid", tile_r=tile)
        out[f"pallas_tile{tile}"] = timed(f"tile{tile}", fn, feat_a, w, z)
        print(f"tile{tile}:", out[f"pallas_tile{tile}"], flush=True)

    fn = lambda f, w, z: apply_anchor_xla(  # noqa: E731
        packed, f, w, z, last_op="sigmoid")
    out["xla"] = timed("xla", fn, feat_a, w, z)
    print("xla:", out["xla"], flush=True)

    # per-point reference: the exact path queries T taps x full MLP via the
    # generic fused kernel on R*T points (gathered feats per tap)
    packed_pt = pack_mlp_params(hp, infer_head_channels(hp),
                                dtype=jnp.bfloat16)
    feat_pt = jax.random.normal(kf, (1, R * T, C + 1), jnp.float32)
    fn = lambda f: apply_packed(  # noqa: E731
        packed_pt, f, last_op="sigmoid")
    out["perpoint_fused"] = timed("perpoint", fn, feat_pt)
    print("perpoint:", out["perpoint_fused"], flush=True)

    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
