"""Segmentation quality gate: the committed MatteNet checkpoint must
actually segment (reference contract: human_inst_seg returns a real alpha
matte, RTL/main.py:345-358 — round 1 shipped only a box prior).

Runs the full Segmentation callable (box prior x matte) on freshly
generated synthetic composites at the demo's 512x512 frame size — the
checkpoint was trained at 256 so this also checks scale transfer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.pipeline.segmentation import Segmentation, alpha_to_bbox
from monoport_tpu.training.matting import synth_batch


@pytest.fixture(scope="module")
def seg():
    s = Segmentation.load_default()
    if s.net is None:
        pytest.skip("no committed mattenet checkpoint")
    return s


def _iou(a, b):
    if b.sum() == 0:  # person-free frame: correct rejection scores 1
        return 1.0 if a.mean() < 0.01 else 0.0
    inter = (a & b).sum()
    return inter / max((a | b).sum(), 1)


def test_mattenet_iou_at_512(seg):
    images, alpha_gt = synth_batch(jax.random.PRNGKey(777), 4, 512)
    segm, bboxes, probs = seg(images, scaled_boxes=[0.0, 0.0, 511.0, 511.0])
    alpha = np.asarray(segm[..., 3])
    gt = np.asarray(alpha_gt)
    ious = [_iou(alpha[i] > 0.5, gt[i] > 0.5) for i in range(len(gt))]
    assert min(ious) > 0.8, ious
    assert float(np.mean(ious)) > 0.9, ious


def test_mattenet_rejects_background(seg):
    """A frame with no person -> near-empty matte (the box fallback would
    return the whole box; the trained net must not)."""
    from monoport_tpu.training.matting import _texture

    key = jax.random.PRNGKey(3)
    ax = jnp.linspace(-1.0, 1.0, 512)
    gx, gy = jnp.meshgrid(ax, -ax, indexing="xy")
    grid = jnp.stack([gx, gy], axis=-1)
    bg = _texture(key, grid)[None]
    segm, bboxes, probs = seg(bg, scaled_boxes=[0.0, 0.0, 511.0, 511.0])
    assert float(np.asarray(segm[..., 3]).mean()) < 0.05


def test_bbox_tracks_subject(seg):
    images, alpha_gt = synth_batch(jax.random.PRNGKey(9), 2, 512)
    segm, bboxes, probs = seg(images, scaled_boxes=[0.0, 0.0, 511.0, 511.0])
    want_box, _ = alpha_to_bbox(alpha_gt)
    got = np.asarray(bboxes)
    want = np.asarray(want_box)
    # bbox within ~16 px of the ground-truth silhouette bbox
    assert np.abs(got - want).max() < 16.0, (got, want)
