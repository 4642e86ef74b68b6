"""End-to-end benchmark: full-frame volumetric recon at 257^3 on one chip.

Measures the flagship path (BASELINE.json metric: "end-to-end recon FPS at
256^3"): netG hourglass filter on a 512x512 frame -> hierarchical occupancy
(17->257, static-budget levels) -> depth peel -> netC texture query ->
256^2 render maps, all as one jitted program (monoport_tpu.engine).

No pretrained checkpoints are reachable in this environment (zero egress),
so weights are random; to keep the hierarchy's candidate counts realistic
(a human-scale surface, not a degenerate random field), the benchmarked
query runs the REAL netG sampling+MLP compute and then selects an analytic
ellipsoid occupancy from it via jnp.where — identical FLOPs/memory traffic,
representative sparsity. vs_baseline is FPS / 30 (the north-star target).

Prints ONE JSON line.
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp


def main():
    from monoport_tpu import get_cfg_defaults
    from monoport_tpu.engine import ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.hierarchy import HierarchicalRecon

    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    netC = MonoPortNet(cfg.netC)

    rng = np.random.RandomState(0)
    image = jnp.asarray(rng.rand(1, 512, 512, 3).astype(np.float32) * 2 - 1)
    points = jnp.zeros((1, 1024, 3), jnp.float32)
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    key = jax.random.PRNGKey(0)
    params_g = netG.init(key, image, points, calib)
    params_c = netC.init(key, image, points, calib,
                         feat_prior=jnp.zeros((1, 128, 128, 256)))

    recon = HierarchicalRecon(
        resolutions=tuple(cfg.recon.resolutions),
        budgets=tuple(cfg.recon.budgets),
        boundary_tau=cfg.recon.boundary_tau,
        dilate=cfg.recon.dilate,
        balance_value=cfg.recon.balance_value,
    )
    engine = ReconEngine(netG, netC, recon=recon,
                         compute_dtype=jnp.bfloat16)

    # Bench frame: engine._frame_impl with the occupancy query wrapped to
    # keep full model compute but select an analytic ellipsoid (see module
    # docstring).
    def frame_impl(params_g, params_c, image_g, image_c, calib_t):
        params_g = engine._cast(params_g)
        params_c = engine._cast(params_c)
        image_g = engine._cast(image_g)
        image_c = engine._cast(image_c)
        feats_g = engine.netG.apply(params_g, image_g, method="filter")

        def query_occ(pts):
            pred = engine.netG.apply(params_g, feats_g, pts, calib_t,
                                     method="query")[0]
            center = jnp.asarray([0.0, -0.1, 0.0])
            radii = jnp.asarray([0.35, 0.8, 0.25])
            d = jnp.linalg.norm((pts - center) / radii, axis=-1)
            analytic = jax.nn.sigmoid((1.0 - d) * 20.0)[..., None]
            return jnp.where(pred > -1.0, analytic.astype(pred.dtype), pred)

        from monoport_tpu.recon.depth_peel import (colorize, depth_peel,
                                                   shade_normal, visualize)
        vol = engine.recon(query_occ)
        maps = depth_peel(vol, engine.direction, engine.recon.balance_value)
        render_norm, mask = visualize(shade_normal(maps), engine.render_size)
        feat_prior = feats_g[-1][-1]
        feats_c = engine.netC.apply(params_c, image_c, feat_prior,
                                    method="filter")

        def query_color(pts):
            return engine.netC.apply(params_c, feats_c, pts, calib_t,
                                     method="query")[0]

        tex_canvas = colorize(maps, query_color,
                              engine.recon.resolutions[-1])
        render_tex, mask_tex = visualize(tex_canvas, engine.render_size)
        return {"render_norm": render_norm, "render_tex": render_tex,
                "mask": mask_tex, "sdf": vol}

    # Timing methodology for the tunneled TPU backend: block_until_ready
    # does not actually block and every un-jitted host dispatch is
    # expensive, so the K-frame loop runs ON DEVICE (lax.fori_loop with a
    # data dependency between frames) and a single scalar fetch at the end
    # materializes the chain; the measured fetch RTT is subtracted.
    iters = 20

    @jax.jit
    def bench_loop(img):
        def body(_, img):
            out = frame_impl(params_g, params_c, img, img, calib)
            return img + out["mask"].astype(jnp.float32).sum() * 1e-12
        return jax.lax.fori_loop(0, iters, body, img)

    out = bench_loop(image)           # compile + run
    _ = np.asarray(out[0, 0, 0, 0])

    t0 = time.perf_counter()
    for i in range(3):
        _ = np.asarray((image.sum() * (i + 1)))
    rtt = (time.perf_counter() - t0) / 3

    t0 = time.perf_counter()
    out = bench_loop(image)
    _ = np.asarray(out[0, 0, 0, 0])
    dt = (time.perf_counter() - t0 - rtt) / iters
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "end-to-end recon FPS at 256^3 (netG filter + hierarchical"
                  " occupancy + depth peel + netC texture, single chip)",
        "value": round(fps, 2),
        "unit": "fps",
        "vs_baseline": round(fps / 30.0, 3),
    }))


if __name__ == "__main__":
    main()
