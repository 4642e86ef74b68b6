"""In-kernel gather vs XLA pre-gather micro-bench, one TPU session.

Measures the fused_gather_mlp experiment (VERDICT r2 missing #3: in-kernel
HBM->VMEM tap gathering had never been measured) against the shipped
compositions at the real frame shapes:

  shape A: fine ray pass   R=192^2 rays x T=6 taps, C=256 (netG fine pass)
  shape B: per-point query R=36864 x T=1            (march level / rotated)

paths per shape:
  xla_gather : ops/sampling.index (XLA gather) -> apply_ray_packed
               (the shipped pre-gathered Pallas ray kernel), f32 table
  in_kernel  : apply_gather_ray_packed (bf16 VMEM table, scalar gather
               loop in-kernel)
  grid       : index_grid separable matmuls -> ray kernel (frontal-only
               structure; same-session reference point)

Rates in M rays/s (marginal method). Run: python scripts/profile_gather_kernel.py
"""

import functools
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from monoport_tpu.utils.compile_cache import enable as _enable_cache

_enable_cache()

from bench import canary_tflops, measure_fps  # noqa: E402
from monoport_tpu.ops.pallas.fused_gather_mlp import (  # noqa: E402
    apply_gather_ray_packed)
from monoport_tpu.ops.pallas.fused_ray_mlp import (  # noqa: E402
    apply_ray_packed, pack_ray_mlp_params)
from monoport_tpu.ops.sampling import bilinear_rows, index  # noqa: E402

CH = (257, 1024, 512, 256, 128, 1)   # netG head (SurfaceClassifier.py:74)


def _rate(fn, args, iters):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(uv, n):
        def body(_, carry):
            uv, acc = carry
            pred = fn(uv, *args)
            return (uv + pred.mean() * 1e-12, acc + pred.sum())
        return jax.lax.fori_loop(0, n, body, (uv, jnp.float32(0)))[1]

    uv0 = args_uv
    for n in (iters, 2 * iters):
        _ = np.asarray(loop(uv0, n))

    def run_n(n):
        _ = np.asarray(loop(uv0, n))

    rate, _ = measure_fps(run_n, iters)
    return rate


def main():
    global args_uv
    rng = np.random.RandomState(0)
    params = {}
    for i in range(len(CH) - 1):
        fan_in = CH[0] if i == 0 else CH[i] + CH[0]
        params[f"filters_{i}"] = {
            "kernel": jnp.asarray(rng.randn(fan_in, CH[i + 1]) * 0.05,
                                  jnp.float32),
            "bias": jnp.zeros((CH[i + 1],), jnp.float32)}
    packed = pack_ray_mlp_params(params, CH, dtype=jnp.bfloat16)

    feat32 = jnp.asarray(rng.randn(1, 128, 128, 256).astype(np.float32))
    out = {"canary_tflops_bf16_pre": round(canary_tflops(), 1)}

    for label, r, taps, iters in (("fine_192x6", 192 * 192, 6, 48),
                                  ("point_36k_t1", 36864, 1, 96)):
        uv = jnp.asarray(
            rng.uniform(-0.74, 0.74, (1, r, 2)).astype(np.float32))
        z = jnp.asarray(rng.randn(1, r, taps).astype(np.float32) * 0.3)
        args_uv = uv

        def xla_gather(uv, z=z):
            feat = index(feat32, uv).astype(jnp.bfloat16)
            return apply_ray_packed(packed, feat, z, "sigmoid")

        def in_kernel(uv, z=z):
            return apply_gather_ray_packed(packed, feat32, uv, z, "sigmoid")

        out[f"{label}_xla_gather_mrays"] = round(
            _rate(xla_gather, (), iters) * r / 1e6, 2)
        print(label, "xla_gather", out[f"{label}_xla_gather_mrays"],
              flush=True)
        try:
            out[f"{label}_in_kernel_mrays"] = round(
                _rate(in_kernel, (), iters) * r / 1e6, 2)
        except Exception as e:  # noqa: BLE001
            out[f"{label}_in_kernel_error"] = repr(e)[:300]
        print(label, "in_kernel",
              out.get(f"{label}_in_kernel_mrays",
                      out.get(f"{label}_in_kernel_error")), flush=True)

    # grid reference (outer-product lattice, 192x192 rays): separable
    # sampling feeding the same ray kernel
    side = 192
    u1 = jnp.asarray(rng.uniform(-0.74, 0.74, (1, side)).astype(np.float32))
    v1 = jnp.asarray(rng.uniform(-0.74, 0.74, (1, side)).astype(np.float32))
    z = jnp.asarray(
        rng.randn(1, side * side, 6).astype(np.float32) * 0.3)
    args_uv = u1

    def grid_path(u1):
        from monoport_tpu.ops.sampling import index_grid
        feat = index_grid(feat32, u1, v1)[0].reshape(1, side * side, 256)
        return apply_ray_packed(packed, feat.astype(jnp.bfloat16), z,
                                "sigmoid")

    out["fine_192x6_grid_mrays"] = round(
        _rate(grid_path, (), 48) * side * side / 1e6, 2)
    print("grid", out["fine_192x6_grid_mrays"], flush=True)

    out["canary_tflops_bf16_post"] = round(canary_tflops(), 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
