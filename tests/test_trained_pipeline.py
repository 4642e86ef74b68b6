"""End-to-end with the COMMITTED trained weights (netG + netC + matting):
a rendered capsule person goes through the full engine and comes out as a
recognizable reconstruction. This is the zero-egress analog of running
the reference demo with its downloaded PIFu checkpoints."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.config import get_cfg_defaults
from monoport_tpu.engine import EngineCfg, ReconEngine
from monoport_tpu.models import MonoPortNet
from monoport_tpu.recon.hierarchy import HierarchicalRecon
from monoport_tpu.training.datasets.capsule import (capsule_occupancy,
                                                    render_front,
                                                    skeleton3d,
                                                    surface_color)
from monoport_tpu.utils.params_io import load_params

DATA = os.path.join(os.path.dirname(__file__), os.pardir, "monoport_tpu",
                    "data")

# cross-family texture gates (measured - 1.5 dB at this file's exact CPU
# config, r5 mixed-curriculum netC; see test_trained_crossfam_generalization)
FLAT_GATE_DB = 32.2     # measured 33.73
SHADED_GATE_DB = 29.9   # measured 31.43


@pytest.fixture(scope="module")
def nets():
    pg = os.path.join(DATA, "netg_capsule.npz")
    pc = os.path.join(DATA, "netc_capsule.npz")
    if not (os.path.exists(pg) and os.path.exists(pc)):
        pytest.skip("committed capsule checkpoints absent")
    cfg = get_cfg_defaults()
    return (MonoPortNet(cfg.netG), {"params": load_params(pg)[0]},
            MonoPortNet(cfg.netC), {"params": load_params(pc)[0]})


def test_trained_engine_reconstructs(nets):
    netG, params_g, netC, params_c = nets
    caps = skeleton3d(jax.random.PRNGKey(4242))    # held-out body
    image, _ = render_front(caps, 512)

    # reduced profile keeps this ~1 min on 1 CPU core; geometry fidelity
    # at the production profile is covered by bench.py's real section
    recon = HierarchicalRecon(resolutions=(17, 33), budgets=(0, 4096),
                              select="uncertain")
    eng = ReconEngine(netG, netC, recon=recon,
              config=EngineCfg.flat(mode="ray", fine_res=129, ray_taps=6,
                                    ray_window=96))
    out = eng.frame(params_g, image[None], params_c, image[None])

    # silhouette vs the analytic ground truth at the fine ray grid
    ax = jnp.linspace(-1, 1, 129)
    gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
    zs = jnp.linspace(-1, 1, 48)
    occ = jax.vmap(lambda z: capsule_occupancy(
        jnp.stack([gx, gy, jnp.full_like(gx, z)], -1), caps) > 0.5)(zs)
    gt_sil = np.asarray(occ.any(axis=0))
    got = np.asarray(out["valid"]) > 0.5
    iou = (got & gt_sil).sum() / (got | gt_sil).sum()
    # trained-model quality gate (not path parity): measured 0.920 at this
    # reduced profile with the committed r3 weights (hard-curriculum netG
    # + sigma/points fine-tune ladder; r2 measured 0.743, first r3 weights
    # 0.906) — the gate locks in most of that so a visibly broken model
    # cannot ship green
    assert iou > 0.88, iou

    # texture quality: PSNR of the rendered color vs the renderer's known
    # shading model at the reconstructed surface (a broken netC measures
    # ~10-15 dB; the committed r3 weights measure 24.4 dB — trained on the
    # textured hard curriculum with a 50/50 plain anchor, re-anchored to
    # the final netG's feature prior)
    from monoport_tpu.recon.depth_peel import visualize
    from monoport_tpu.training.datasets.capsule import gt_texture_canvas
    from monoport_tpu.training.metrics import masked_psnr

    tex = np.asarray(out["render_tex"])     # display space [0, 1]
    mask = np.asarray(out["mask"])
    mask = (mask[..., 0] if mask.ndim == 3 else mask) > 0.5
    assert mask.sum() > 200
    gt_canvas = gt_texture_canvas(jnp.asarray(out["depth"]),
                                  jnp.asarray(out["valid"]), 129)
    gt_vis, _ = visualize(gt_canvas, eng.render_size)
    psnr, mae = masked_psnr(tex, np.asarray(gt_vis), mask)
    assert psnr > 23.0, (psnr, mae)


def test_trained_matting_plus_engine(nets):
    """Segmentation -> engine chain with trained weights: the matte from
    MatteNet masks the image the engine consumes (RTL/main.py:353-358)."""
    from monoport_tpu.pipeline.segmentation import Segmentation
    from monoport_tpu.training.matting import synth_batch

    seg = Segmentation.load_default()
    if seg.net is None:
        pytest.skip("no mattenet checkpoint")
    images, alpha_gt = synth_batch(jax.random.PRNGKey(6), 1, 512)
    segm, bbox, probs = seg(images, scaled_boxes=[0., 0., 511., 511.])
    rgb = np.asarray(segm[..., :3])
    alpha = np.asarray(segm[..., 3:4])
    masked = rgb * (alpha > 0.5)
    # the masked output keeps the person and zeroes the background
    gt = np.asarray(alpha_gt[0]) > 0.5
    bg_energy = np.abs(masked[0][~gt]).mean()
    fg_energy = np.abs(masked[0][gt]).mean()
    assert fg_energy > 5 * bg_energy, (fg_energy, bg_energy)


def test_trained_crossfam_generalization(nets):
    """The committed netG AND netC generalize OUTSIDE their training
    family (VERDICT r3 item 3 / r4 item 4): silhouette IOU + texture
    PSNR on a superquadric-limb body (boxy cross-sections the capsule
    generator cannot emit; shaded and shading-free renders) and IOU on
    the PPL-fixture ellipsoid. Measured at this test's exact CPU config
    (seed 31337, 129-ray profile, highest matmul precision; r5 session,
    mixed-curriculum netC): IOU flat 0.9249 / shaded 0.9100 / ellipsoid
    0.8947, tex PSNR flat 33.73 dB / shaded 31.43 dB — gates locked at
    measured-0.02 IOU / -1.5 dB, so a regression of the committed
    weights cannot ship green. The 3-seed sweep record lives in
    scripts/eval_crossfam.py + DESIGN.md (the capsule-only r3 netC
    measured 18.4 dB on the flat family — the texture gate exists to
    keep that crater fixed)."""
    from monoport_tpu.recon.depth_peel import visualize
    from monoport_tpu.training.datasets import superquadric as sq
    from monoport_tpu.training.datasets.capsule import gt_texture_canvas
    from monoport_tpu.training.datasets.fixture import RADII
    from monoport_tpu.training.metrics import masked_psnr

    netG, params_g, netC, params_c = nets
    recon = HierarchicalRecon(resolutions=(17, 33), budgets=(0, 4096),
                              select="uncertain")
    eng = ReconEngine(netG, netC, recon=recon,
              config=EngineCfg.flat(mode="ray", fine_res=129, ray_taps=6,
                                    ray_window=96))
    calib = jnp.eye(4, dtype=jnp.float32)[None]

    def iou(image, occ_fn, flat=False, tex=True):
        out = eng.frame(params_g, image[None],
                        params_c if tex else None,
                        image[None] if tex else None, calib=calib)
        got = np.asarray(out["valid"]) > 0.5
        ax = jnp.linspace(-1, 1, 129)
        gx, gy = jnp.meshgrid(ax, ax, indexing="ij")
        zs = jnp.linspace(-1, 1, 48)
        occ = jax.vmap(lambda z: occ_fn(
            jnp.stack([gx, gy, jnp.full_like(gx, z)], -1)) > 0.5)(zs)
        gt = np.asarray(occ.any(axis=0))
        iou_v = (got & gt).sum() / max((got | gt).sum(), 1)
        if not tex:
            return iou_v, None
        canvas = gt_texture_canvas(jnp.asarray(out["depth"]),
                                   jnp.asarray(out["valid"]), 129,
                                   flat=flat)
        gt_vis, _ = visualize(canvas, eng.render_size)
        m = np.asarray(out["mask"])
        m = (m[..., 0] if m.ndim == 3 else m) > 0.5
        psnr, _ = masked_psnr(np.asarray(out["render_tex"]),
                              np.asarray(gt_vis), m)
        return iou_v, psnr

    body = sq.sq_body(jax.random.PRNGKey(31337))
    occ = lambda pts: sq.sq_occupancy(pts, body)  # noqa: E731
    iou_flat, psnr_flat = iou(sq.render_front(body, 512, flat=True)[0],
                              occ, flat=True)
    assert iou_flat > 0.90, iou_flat
    assert psnr_flat > FLAT_GATE_DB, psnr_flat
    iou_shaded, psnr_shaded = iou(sq.render_front(body, 512)[0], occ)
    # measured values surface in CI logs (-s) and on any gate failure
    print(f"crossfam tex PSNR: flat {psnr_flat:.2f} shaded {psnr_shaded:.2f}"
          f" | IOU flat {iou_flat:.4f} shaded {iou_shaded:.4f}")
    assert iou_shaded > 0.89, iou_shaded
    assert psnr_shaded > SHADED_GATE_DB, psnr_shaded

    from monoport_tpu.training.datasets.fixture import _render_rgba
    rgba = np.asarray(_render_rgba(0, 512), dtype=np.float32) / 255.0
    ell = jnp.asarray((rgba[..., :3] * 2.0 - 1.0) * (rgba[..., 3:4] > 0.5))
    radii = jnp.asarray(RADII)
    # the fixture's PIL colors are not the render_front_occ shading
    # model, so the ellipsoid family stays geometry-only (tex=False)
    iou_ell, _ = iou(ell, lambda pts: (jnp.square(pts / radii).sum(-1)
                                       <= 1.0).astype(jnp.float32),
                     tex=False)
    assert iou_ell > 0.87, iou_ell
