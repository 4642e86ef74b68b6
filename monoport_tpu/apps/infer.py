"""Single-image -> colored mesh inference (BASELINE configs #1-#3).

New user-facing capability vs the reference (which only live-renders):
reconstruct the occupancy field from one image and export a colored
triangle mesh.

Run:
    python -m monoport_tpu.apps.infer --image person.png --out mesh.obj \
        -- netG.ckpt_path data/PIFu/net_G netC.ckpt_path data/PIFu/net_C
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

import jax.numpy as jnp

from ..config import get_cfg_defaults
from ..pipeline.segmentation import Segmentation
from ..recon.dense import dense_eval
from ..recon.hierarchy import HierarchicalRecon
from ..recon.marching import extract_mesh
from ..utils import save_obj_mesh, save_obj_mesh_with_color


def parse_args(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image", required=True)
    parser.add_argument("--out", default="mesh.obj")
    parser.add_argument("--dense", action="store_true",
                        help="exhaustive grid eval instead of hierarchical")
    parser.add_argument("--resolution", type=int, default=0,
                        help="override final resolution (dense mode)")
    parser.add_argument("--max_cells", type=int, default=131072)
    parser.add_argument("--no_color", action="store_true")
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        argv, opts = argv[:split], argv[split + 1:]
    else:
        opts = []
    args = parser.parse_args(argv)
    cfg = get_cfg_defaults()
    cfg.merge_from_list(opts)
    cfg.freeze()
    return args, cfg


def load_image(path: str, size: int = 512) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, np.float32) / 255.0


def reconstruct(args, cfg):
    from .rtl_main import _init_random_params, load_networks

    netG, params_g, netC, params_c = load_networks(cfg)
    if params_g is None:
        print("WARNING: no netG checkpoint; using random weights")
        params_g = _init_random_params(netG)

    frame = load_image(args.image)
    seg = Segmentation.load_default()
    segm, bboxes, probs = seg(jnp.asarray(frame[None]))
    mean = np.asarray(cfg.netG.mean, np.float32)
    std = np.asarray(cfg.netG.std, np.float32)
    rgb, alpha = segm[..., :3], segm[..., 3:4]
    input_g = (((rgb * 0.5 + 0.5) - mean) / std) * alpha
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    feats_g = netG.apply(params_g, input_g, method="filter")

    def query_occ(pts):
        return netG.apply(params_g, feats_g, pts, calib, method="query")[0]

    if args.dense:
        res = args.resolution or 65
        vol = dense_eval(query_occ, res)
    else:
        recon = HierarchicalRecon(
            resolutions=tuple(cfg.recon.resolutions),
            budgets=tuple(cfg.recon.budgets),
            boundary_tau=cfg.recon.boundary_tau,
            dilate=cfg.recon.dilate,
            balance_value=cfg.recon.balance_value)
        vol = recon(query_occ)

    verts, faces = extract_mesh(vol, cfg.recon.balance_value,
                                max_cells=args.max_cells)
    print(f"extracted mesh: {len(verts)} verts, {len(faces)} faces")

    colors = None
    if netC is not None and params_c is not None and not args.no_color:
        input_c = rgb * alpha
        feat_prior = feats_g[-1][-1]
        feats_c = netC.apply(params_c, input_c, feat_prior, method="filter")
        preds = netC.apply(params_c, feats_c, jnp.asarray(verts[None]),
                           calib, method="query")[0]
        colors = np.clip(np.asarray(preds[0]) * 0.5 + 0.5, 0, 1)
    return verts, faces, colors


def main(argv=None):
    args, cfg = parse_args(argv)
    verts, faces, colors = reconstruct(args, cfg)
    if colors is not None:
        save_obj_mesh_with_color(args.out, verts, faces, colors)
    else:
        save_obj_mesh(args.out, verts, faces)
    print(f"saved {args.out}")
    return len(verts)


if __name__ == "__main__":
    main()
