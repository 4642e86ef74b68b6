"""Quality eval: the anchored rotated-refine path vs the exact per-point
path, on the COMMITTED trained weights (CPU, reduced profile).

The anchored query (monoport_net.query_taps_anchored) lerps features
between K anchors along each refine ray — exact geometry, approximate
features wherever the bilinear sample is nonlinear across the segment.
This script measures that approximation END TO END: per orbit pose, the
rotated frame's valid/depth/texture deltas of rot_anchors=K vs
rot_anchors=None (identical march + compaction, so the ONLY difference is
the refine-level feature lerp), plus each path's silhouette IOU against
the analytic GT in view space. Run on CPU (f32, no Pallas):

    python scripts/eval_rotated_anchored.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402

from monoport_tpu import get_cfg_defaults  # noqa: E402
from monoport_tpu.engine import EngineCfg, ReconEngine  # noqa: E402
from monoport_tpu.models import MonoPortNet  # noqa: E402
from monoport_tpu.recon.calib import pifu_calib  # noqa: E402
from monoport_tpu.recon.hierarchy import HierarchicalRecon  # noqa: E402
from monoport_tpu.render.camera import orbit_extrinsic  # noqa: E402
from monoport_tpu.training.datasets.capsule import (  # noqa: E402
    capsule_occupancy, render_front, skeleton3d)
from monoport_tpu.utils.params_io import load_params  # noqa: E402

DATA = os.path.join(os.path.dirname(__file__), os.pardir, "monoport_tpu",
                    "data")
POSES = ((10.0, 0.0), (20.0, 10.0), (35.0, 10.0), (60.0, 15.0))


def build(rot_anchors, texels=1.0):
    cfg = get_cfg_defaults()
    netG = MonoPortNet(cfg.netG)
    params_g = {"params": load_params(
        os.path.join(DATA, "netg_capsule.npz"))[0]}
    netC = MonoPortNet(cfg.netC)
    params_c = {"params": load_params(
        os.path.join(DATA, "netc_capsule.npz"))[0]}
    recon = HierarchicalRecon(resolutions=(17, 33), budgets=(0, 4096),
                              select="uncertain")
    eng = ReconEngine(netG, netC, recon=recon,
              config=EngineCfg.flat(mode="ray", fine_res=129, ray_taps=6,
                                    ray_window=96, march_levels=(17, 33),
                                    compact_rotated=0.625,
                                    rot_anchors=rot_anchors,
                                    rot_anchor_texels=texels))
    return eng, params_g, params_c


def gt_silhouette_view(caps, calib, res=129, n_z=48):
    """Analytic silhouette on the VIEW-space ray lattice: the engine
    projects recon-space points through ``calib`` into the PIFu/capsule
    space the model was trained in (pifu_calib chain, RTL/recon.py:5-25),
    so the GT occupancy of a lattice point is the capsule occupancy at
    its calib image."""
    c = np.asarray(calib)[0]
    ax = np.linspace(-1, 1, res, dtype=np.float32)
    gx, gy = np.meshgrid(ax, ax, indexing="ij")
    sil = np.zeros((res, res), bool)
    for z in np.linspace(-1, 1, n_z, dtype=np.float32):
        p = np.stack([gx, gy, np.full_like(gx, z),
                      np.ones_like(gx)], -1).reshape(-1, 4)
        world = (p @ c.T)[:, :3].reshape(res, res, 3)
        sil |= np.asarray(
            capsule_occupancy(jnp.asarray(world), caps)) > 0.5
    return sil


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--texels", type=float, nargs="*", default=None,
                    help="sweep rot_anchor_texels tolerances at "
                    "rot_anchors='auto' instead of the default "
                    "(None, 'auto'@1.0, pinned-3) mode comparison")
    args = ap.parse_args()

    t0 = time.time()
    caps = skeleton3d(jax.random.PRNGKey(31337))
    image = render_front(caps, 512)[0][None]
    if args.texels:
        modes = (None,) + tuple(f"tx{t:g}" for t in args.texels)
        engines = {None: build(None)}
        engines.update({f"tx{t:g}": build("auto", texels=t)
                        for t in args.texels})
    else:
        modes = (None, "auto", 3)
        engines = {k: build(k) for k in modes}
    out = {}
    for yaw, pitch in POSES:
        ext = orbit_extrinsic(yaw, pitch)
        calib = jnp.asarray(pifu_calib(ext, np.eye(4, dtype=np.float32)))
        tag = f"y{int(yaw)}p{int(pitch)}"
        results = {}
        for k, (eng, pg, pc) in engines.items():
            assert not eng._calib_taps_ok(calib)
            results[k] = eng.frame(pg, image, pc, image, calib)
        for k in modes[1:]:
            if isinstance(k, str):
                out[f"{tag}_plan_{k}"] = str(
                    engines[k][0]._rot_anchor_plan(calib, image.shape[1]))
        gt = gt_silhouette_view(caps, calib)
        vd = np.asarray(results[None]["valid"]) > 0.5
        out[f"{tag}_iou_gt_pp"] = round(
            float((vd & gt).sum() / max((vd | gt).sum(), 1)), 4)
        for k in modes[1:]:
            va = np.asarray(results[k]["valid"]) > 0.5
            out[f"{tag}_iou_anch{k}_vs_pp"] = round(
                float((va & vd).sum() / max((va | vd).sum(), 1)), 4)
            out[f"{tag}_iou_gt_anch{k}"] = round(
                float((va & gt).sum() / max((va | gt).sum(), 1)), 4)
            both = va & vd
            dd = np.abs(np.asarray(results[k]["depth"])
                        - np.asarray(results[None]["depth"]))[both]
            out[f"{tag}_depth_mad_anch{k}"] = round(float(dd.mean()), 4)
            out[f"{tag}_depth_p95_anch{k}"] = round(
                float(np.percentile(dd, 95)), 4)
            tex = np.abs(np.asarray(results[k]["render_tex"])
                         - np.asarray(results[None]["render_tex"]))
            out[f"{tag}_tex_mad_anch{k}"] = round(float(tex.mean()), 5)
            dropped = results[k].get("compact_dropped")
            if dropped is not None:
                out[f"{tag}_dropped_anch{k}"] = np.asarray(dropped).tolist()
        print(tag, {kk: vv for kk, vv in out.items() if kk.startswith(tag)},
              flush=True)
    out["wall_s"] = round(time.time() - t0, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
