"""Cross-family generalization eval for the committed netG weights.

The committed model trains on the capsule family (capsule.py); held-out
capsule SEEDS measure in-domain quality only. This script measures
silhouette IOU on bodies that generator CANNOT emit — the generalization
evidence the reference gets for free from its pretrained real-people
checkpoints (/root/reference/README.md:44-51, unreachable here):

  capsule   — held-out seeds of the training family (in-domain reference)
  sq        — superquadric-limb bodies (boxy cross-sections, flat end
              caps; datasets/superquadric.py), shaded renders
  sq_flat   — same bodies, shading-free flat-color renders
  ellipsoid — the PPL fixture family (fixture.py): flat PIL silhouette
              of the analytic ellipsoid, exact inside() ground truth

Run:  python scripts/eval_crossfam.py [--cpu] [--fine_res 129] [ckpt.npz]
CPU default uses the reduced 129-ray profile (~1 min/frame); TPU runs the
bench 257-ray profile. Prints one JSON line per checkpoint.
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))


def gt_silhouette(occ_fn, res: int, n_z: int = 64):
    import jax
    import jax.numpy as jnp
    ax = jnp.linspace(-1, 1, res)
    gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
    zs = jnp.linspace(-1, 1, n_z)
    occ = jax.vmap(lambda z: occ_fn(
        jnp.stack([gx, gy, jnp.full_like(gx, z)], -1)) > 0.5)(zs)
    return np.asarray(occ.any(axis=0))


def fixture_image(size: int = 512):
    """The PPL fixture's frontal render in the netG input contract
    (rgb * 2 - 1, background zeroed by the alpha mask)."""
    from monoport_tpu.training.datasets.fixture import _render_rgba
    rgba = np.asarray(_render_rgba(0, size), dtype=np.float32) / 255.0
    mask = rgba[..., 3:4] > 0.5
    return (rgba[..., :3] * 2.0 - 1.0) * mask


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt", nargs="*", default=None)
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--fine_res", type=int, default=None,
                   help="ray grid (default: 129 on cpu, 257 otherwise)")
    p.add_argument("--seeds", type=int, nargs="*",
                   default=[31337, 4242, 777])
    p.add_argument("--no_tex", action="store_true",
                   help="skip the netC texture PSNR even if the "
                        "committed netc_capsule.npz is present")
    p.add_argument("--netc", default=None,
                   help="netC checkpoint for the texture PSNR "
                        "(default: the committed netc_capsule.npz)")
    args = p.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from monoport_tpu import get_cfg_defaults
    from monoport_tpu.engine import EngineCfg, ReconEngine
    from monoport_tpu.models import MonoPortNet
    from monoport_tpu.recon.hierarchy import HierarchicalRecon
    from monoport_tpu.training.datasets import superquadric as sq
    from monoport_tpu.training.datasets.capsule import (capsule_occupancy,
                                                        render_front,
                                                        skeleton3d)
    from monoport_tpu.training.datasets.fixture import RADII
    from monoport_tpu.utils.compile_cache import enable as _enable
    from monoport_tpu.utils.params_io import load_params

    _enable()
    fine = args.fine_res or (129 if args.cpu else 257)
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)

    def build_engine(netC=None):
        if fine >= 257:
            return ReconEngine(netG, netC,
                       recon=HierarchicalRecon(resolutions=(17, 33, 65), budgets=(0, 4096, 16384), select="uncertain"),
                       config=EngineCfg.flat(mode="ray", fine_res=257,
                                             ray_taps=6, ray_window=192,
                                             compute_dtype=jnp.bfloat16,
                                             use_pallas=True,
                                             march_levels=(33, 65)))
        return ReconEngine(netG, netC,
                   recon=HierarchicalRecon(resolutions=(17, 33), budgets=(0, 4096), select="uncertain"),
                   config=EngineCfg.flat(mode="ray", fine_res=fine, ray_taps=6,
                                         ray_window=96))

    engine = build_engine()
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    # trained netC (committed): cross-family TEXTURE PSNR rides the same
    # frames (VERDICT r4 item 4) — the GT surface color is the shared
    # render_front_occ shading model at the reconstructed surface, which
    # is exactly what gt_texture_canvas paints for ANY family rendered
    # through it (capsule and superquadric both)
    netC, params_c = None, None
    ckpt_c = args.netc or os.path.join(os.path.dirname(__file__), os.pardir,
                                       "monoport_tpu", "data",
                                       "netc_capsule.npz")
    if os.path.exists(ckpt_c) and not args.no_tex:
        netC = MonoPortNet(cfg.netC)
        params_c = {"params": load_params(ckpt_c)[0]}
        engine = build_engine(netC)

    from monoport_tpu.recon.depth_peel import visualize
    from monoport_tpu.training.datasets.capsule import gt_texture_canvas
    from monoport_tpu.training.metrics import masked_psnr

    def iou_of(image, occ_fn, params_g, flat=False, appearance=None,
               tex_gt=True):
        out = engine.frame(params_g, image[None], params_c,
                           image[None] if params_c is not None else None,
                           calib=calib)
        got = np.asarray(out["valid"]) > 0.5
        gt = gt_silhouette(occ_fn, fine)
        iou = float((got & gt).sum() / max((got | gt).sum(), 1))
        psnr = None
        if netC is not None and tex_gt and "render_tex" in out:
            canvas = gt_texture_canvas(jnp.asarray(out["depth"]),
                                       jnp.asarray(out["valid"]), fine,
                                       flat=flat, appearance=appearance)
            gt_vis, _ = visualize(canvas, engine.render_size)
            m = np.asarray(out["mask"])
            m = (m[..., 0] if m.ndim == 3 else m) > 0.5
            psnr, _ = masked_psnr(np.asarray(out["render_tex"]),
                                  np.asarray(gt_vis), m)
        return iou, psnr

    paths = args.ckpt or [os.path.join(
        os.path.dirname(__file__), os.pardir, "monoport_tpu", "data",
        "netg_capsule.npz")]
    for path in paths:
        params_g = {"params": load_params(path)[0]}
        res = {"ckpt": os.path.basename(path), "fine_res": fine}
        fams = {"capsule": [], "sq": [], "sq_flat": []}
        tex = {"capsule": [], "sq": [], "sq_flat": []}

        def record(fam, pair):
            iou, psnr = pair
            fams[fam].append(iou)
            if psnr is not None:
                tex[fam].append(psnr)

        for seed in args.seeds:
            caps = skeleton3d(jax.random.PRNGKey(seed))
            img = render_front(caps, 512)[0]
            record("capsule", iou_of(
                img, lambda pts: capsule_occupancy(pts, caps), params_g))
            body = sq.sq_body(jax.random.PRNGKey(seed))
            occ = lambda pts: sq.sq_occupancy(pts, body)  # noqa: E731
            record("sq", iou_of(
                sq.render_front(body, 512)[0], occ, params_g))
            record("sq_flat", iou_of(
                sq.render_front(body, 512, flat=True)[0], occ, params_g,
                flat=True))
        radii = jnp.asarray(RADII)
        # the fixture's PIL colors are not the render_front_occ shading
        # model, so the ellipsoid family is geometry-only (tex_gt=False)
        fams["ellipsoid"] = [iou_of(
            jnp.asarray(fixture_image()),
            lambda pts: (jnp.square(pts / radii).sum(-1) <= 1.0
                         ).astype(jnp.float32), params_g, tex_gt=False)[0]]
        for fam, vals in fams.items():
            res[fam] = round(float(np.mean(vals)), 4)
            res[fam + "_min"] = round(float(np.min(vals)), 4)
        for fam, vals in tex.items():
            if vals:
                res[fam + "_tex_psnr"] = round(float(np.mean(vals)), 2)
                res[fam + "_tex_psnr_min"] = round(float(np.min(vals)), 2)
        print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
