"""TPU probe: bilinear sampling as ONE 2x2-patch slice-gather per point
vs the shipped 4 row-gathers (ops/sampling.grid_sample_2d).

The rotated-frame stage ledger puts ~9.6 ms on the compacted per-point
texture stage; its cost is gather ADDRESSING (4 indices/point into
512-ch rows), not bytes or FLOPs. lax.gather with slice_sizes (1,2,2,C)
reads the whole bilinear footprint with one index per point.

Shapes probed: the rotated texture (18432 pts, 512 ch) and the rotated
march (36961 pts, 256 ch) — plus bf16 variants.

Usage: python scripts/probe_patch_gather.py
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

from monoport_tpu.ops.sampling import grid_sample_2d  # noqa: E402


def grid_sample_2d_patch(feat, uv):
    """One (2, 2, C) slice-gather per point + hat weights (exact bilinear
    with zeros padding: clamped patch starts + hat weights reproduce the
    border/outside cases, like ops/sampling.bilinear_rows)."""
    b, h, w, c = feat.shape
    u, v = uv[..., 0], uv[..., 1]
    x = (u + 1.0) * 0.5 * (w - 1)
    y = (v + 1.0) * 0.5 * (h - 1)
    sx = jnp.clip(jnp.floor(x), 0, w - 2).astype(jnp.int32)
    sy = jnp.clip(jnp.floor(y), 0, h - 2).astype(jnp.int32)

    def one_batch(fb, syb, sxb):
        starts = jnp.stack([syb, sxb], axis=-1)          # [N, 2]
        dnums = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3), collapsed_slice_dims=(),
            start_index_map=(0, 1))
        return jax.lax.gather(fb, starts, dnums, (2, 2, c),
                              mode=jax.lax.GatherScatterMode.CLIP)

    patch = jax.vmap(one_batch)(feat, sy, sx)            # [B, N, 2, 2, C]
    offs = jnp.arange(2, dtype=jnp.float32)
    hx = jnp.maximum(0.0, 1.0 - jnp.abs(
        x[..., None] - (sx[..., None].astype(jnp.float32) + offs)))
    hy = jnp.maximum(0.0, 1.0 - jnp.abs(
        y[..., None] - (sy[..., None].astype(jnp.float32) + offs)))
    wgt = (hy[..., :, None] * hx[..., None, :]).astype(feat.dtype)
    return (patch * wgt[..., None]).sum(axis=(2, 3))


def timed(fn, *args, iters=40):
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
        return {"ok": True,
                "ms": round((t[2 * iters] - t[iters]) / iters * 1000.0, 3)}
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "err": str(e)[:200]}


def main():
    out = {"canary": round(bench.canary_tflops(), 1)}
    print(json.dumps(out), flush=True)
    key = jax.random.PRNGKey(0)
    for name, n_pts, ch in (("tex", 18432, 512), ("march", 36961, 256)):
        feat = jax.random.normal(key, (1, 128, 128, ch), jnp.float32)
        uv = jax.random.uniform(jax.random.fold_in(key, 1), (1, n_pts, 2),
                                minval=-1.05, maxval=1.05)
        # exactness first (CPU-independent: same device)
        a = np.asarray(grid_sample_2d(feat[:, :, :, :8], uv))
        b = np.asarray(grid_sample_2d_patch(feat[:, :, :, :8], uv))
        out[f"{name}_maxdiff"] = float(np.abs(a - b).max())
        for dt in (jnp.float32, jnp.bfloat16):
            f = feat.astype(dt)
            tag = f"{name}_{dt.__name__}"
            out[tag + "_rows"] = timed(lambda f, uv: grid_sample_2d(f, uv),
                                       f, uv)
            out[tag + "_patch"] = timed(
                lambda f, uv: grid_sample_2d_patch(f, uv), f, uv)
            print(tag, out[tag + "_rows"], out[tag + "_patch"], flush=True)
    out["canary_post"] = round(bench.canary_tflops(), 1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
