"""Detector unit + quality gates (human_det replacement, SURVEY §2.3).

Covers: static-shape decode correctness, loss sanity (gradient descent on
synthetic scenes reduces it), and — when the committed checkpoint exists —
a held-out quality gate: confident detections must localize the synthetic
people (matched IOU) and reject person-free frames."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from monoport_tpu.pipeline.detection import (Detection, DetectNet, decode,
                                             gaussian_heatmap)
from monoport_tpu.training.detection import (box_iou, detection_loss,
                                             make_train_fns,
                                             synth_det_batch)


def test_decode_single_peak():
    g = 8
    heat = jnp.full((1, g, g, 1), -8.0).at[0, 3, 5, 0].set(4.0)
    # size head carries LOG grid extents (decode exponentiates)
    size = jnp.zeros((1, g, g, 2)).at[0, 3, 5].set(
        jnp.log(jnp.asarray([4.0, 6.0])))
    off = jnp.zeros((1, g, g, 2)).at[0, 3, 5].set(jnp.asarray([0.25, -0.25]))
    boxes, probs = decode(heat, size, off, stride=16, k=2)
    cx, cy = (5 + 0.5 + 0.25) * 16, (3 + 0.5 - 0.25) * 16
    np.testing.assert_allclose(np.asarray(boxes[0, 0]),
                               [cx - 32, cy - 48, cx + 32, cy + 48],
                               atol=1e-4)
    assert float(probs[0, 0]) > 0.97
    assert float(probs[0, 1]) < 0.01  # second slot: no peak


def test_decode_suppresses_nonpeaks():
    """Two adjacent high cells -> only the larger is a peak."""
    g = 8
    heat = jnp.full((1, g, g, 1), -8.0)
    heat = heat.at[0, 4, 4, 0].set(4.0).at[0, 4, 5, 0].set(3.0)
    size = jnp.full((1, g, g, 2), 2.0)
    off = jnp.zeros((1, g, g, 2))
    boxes, probs = decode(heat, size, off, stride=16, k=2)
    assert float(probs[0, 0]) > 0.97
    assert float(probs[0, 1]) < 0.01


def test_gaussian_heatmap_peaks_at_centers():
    cx = jnp.asarray([[4.0, 10.0]])
    cy = jnp.asarray([[4.0, 12.0]])
    w = jnp.asarray([[4.0, 6.0]])
    h = jnp.asarray([[8.0, 6.0]])
    valid = jnp.asarray([[True, False]])
    hm = gaussian_heatmap(cx, cy, w, h, valid, 16)
    assert hm.shape == (1, 16, 16)
    # grid cell (4,4) has its sample point at (4.5,4.5) — both neighbors
    # of center (4.0,4.0) are equal; the peak region must be there
    iy, ix = np.unravel_index(np.asarray(hm[0]).argmax(), (16, 16))
    assert abs(iy - 4) <= 1 and abs(ix - 4) <= 1
    # invalid instance contributes nothing
    assert float(hm[0, 12, 10]) < 0.2


def test_loss_decreases():
    net = DetectNet(width=8)
    init_fn, run_fn = make_train_fns(net, 128, 4, 1e-3)
    state = init_fn(jax.random.PRNGKey(0))
    run = jax.jit(run_fn, static_argnums=2)
    state, l0 = run(state, jax.random.PRNGKey(1), 5)
    state, l1 = run(state, jax.random.PRNGKey(2), 30)
    assert float(l1) < float(l0)


def test_segmentation_uses_detector_boxes():
    """Segmentation with a detector and no explicit scaled_boxes derives
    the detection region from the detector (RTL/main.py:345-350 flow),
    not the fixed prior."""
    from monoport_tpu.pipeline.segmentation import Segmentation

    class StubDet:
        def person_box(self, images, fallback=None):
            return jnp.tile(jnp.asarray([[10.0, 20.0, 100.0, 200.0]]),
                            (images.shape[0], 1))

    seg = Segmentation(variables=None, detector=StubDet())
    imgs = jnp.full((1, 256, 256, 3), 0.5)
    segm, bbox, probs = seg(imgs)
    alpha = np.asarray(segm[0, ..., 3])
    assert alpha[100, 50] == 1.0 and alpha[100, 150] == 0.0
    np.testing.assert_allclose(np.asarray(bbox[0]), [10, 20, 100, 200])
    # explicit scaled_boxes still wins over the detector
    segm2, bbox2, _ = seg(imgs, scaled_boxes=[0.0, 0.0, 255.0, 255.0])
    assert float(np.asarray(segm2[0, ..., 3]).mean()) > 0.9


@pytest.fixture(scope="module")
def det():
    d = Detection.load_default()
    if d is None:
        pytest.skip("no committed detectnet checkpoint")
    return d


def test_trained_detector_localizes(det):
    """Committed weights: every synthetic person is matched by a confident
    detection with IOU >= 0.5 on held-out scenes (at the 256 train size)."""
    images, gt_boxes, gt_valid = synth_det_batch(
        jax.random.PRNGKey(4242), 8, 256)
    boxes, probs = det(images)
    ious = []
    for i in range(images.shape[0]):
        conf = np.where(np.asarray(probs[i]) > 0.3)[0]
        for j in np.where(np.asarray(gt_valid[i]))[0]:
            cand = [float(np.asarray(box_iou(boxes[i, m], gt_boxes[i, j])))
                    for m in conf]
            ious.append(max(cand) if cand else 0.0)
    assert ious, "no valid people in held-out batch?!"
    # r3 weights measure 0.849 held-out on the hardened curriculum
    # (0-4 people, 0.25-1.1x scales, occlusion, capsule distractors);
    # gates locked to the measured level (VERDICT r3 item 8)
    assert float(np.mean(ious)) > 0.8, ious
    assert float(np.min(ious)) > 0.5, ious


def test_trained_detector_localizes_512(det):
    """Same gate at the 512 demo resolution (ADVICE r2: the pipeline
    feeds 512 frames; the size/offset heads must hold there, not just at
    the 256 train size — r3 trains mixed 256/512 chunks). r3 weights
    measure 0.838 held-out at 512."""
    images, gt_boxes, gt_valid = synth_det_batch(
        jax.random.PRNGKey(4242), 4, 512)
    boxes, probs = det(images)
    ious = []
    for i in range(images.shape[0]):
        conf = np.where(np.asarray(probs[i]) > 0.3)[0]
        for j in np.where(np.asarray(gt_valid[i]))[0]:
            cand = [float(np.asarray(box_iou(boxes[i, m], gt_boxes[i, j])))
                    for m in conf]
            ious.append(max(cand) if cand else 0.0)
    assert ious, "no valid people in held-out batch?!"
    # gate locked to the measured 0.838 level (VERDICT r3 item 8)
    assert float(np.mean(ious)) > 0.8, ious
    assert float(np.min(ious)) > 0.5, ious


def test_trained_detector_rejects_background(det):
    from monoport_tpu.training.matting import _texture

    ax = jnp.linspace(-1.0, 1.0, 256)
    gx, gy = jnp.meshgrid(ax, -ax, indexing="xy")
    grid = jnp.stack([gx, gy], axis=-1)
    bg = jnp.stack([_texture(jax.random.PRNGKey(s), grid)
                    for s in (5, 6)])
    _, probs = det(bg)
    assert float(np.asarray(probs).max()) < 0.3, np.asarray(probs)


def test_person_box_focuses_subject(det):
    """person_box: padded union of confident boxes covers the subject and
    is materially tighter than the frame; falls back on empty frames."""
    images, gt_boxes, gt_valid = synth_det_batch(
        jax.random.PRNGKey(77), 4, 256)
    region = np.asarray(det.person_box(images))
    boxes, probs = det(images)
    for i in range(4):
        valid = np.asarray(gt_valid[i])
        if not valid.any():
            continue
        # region-CONSTRUCTION semantics: the padded union must cover the
        # people the detector saw (recall of hard occluded instances is
        # gated by test_trained_detector_localizes, not here)
        conf = np.where(np.asarray(probs[i]) > 0.3)[0]
        seen = [j for j in np.where(valid)[0]
                if any(float(np.asarray(box_iou(boxes[i, m],
                                                gt_boxes[i, j]))) >= 0.5
                       for m in conf)]
        if not seen:
            continue
        want = np.asarray(gt_boxes[i])[seen]
        x1, y1 = want[:, 0].min(), want[:, 1].min()
        x2, y2 = want[:, 2].max(), want[:, 3].max()
        r = region[i]
        # slack ~11% of the frame: box-regression error on frame-edge-
        # clipped instances (their centers shift toward the visible part)
        assert r[0] <= x1 + 28 and r[1] <= y1 + 28, (r, (x1, y1, x2, y2))
        assert r[2] >= x2 - 28 and r[3] >= y2 - 28, (r, (x1, y1, x2, y2))

    from monoport_tpu.training.matting import _texture
    ax = jnp.linspace(-1.0, 1.0, 256)
    gx, gy = jnp.meshgrid(ax, -ax, indexing="xy")
    grid = jnp.stack([gx, gy], axis=-1)
    bg = _texture(jax.random.PRNGKey(8), grid)[None]
    fb = jnp.asarray([10.0, 20.0, 200.0, 220.0])
    r = np.asarray(det.person_box(bg, fallback=fb))[0]
    np.testing.assert_allclose(r, np.asarray(fb))
