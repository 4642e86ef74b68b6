"""Human segmentation / matting (L3 perception pre-processing).

Reference contract: the external ``human_inst_seg`` package (call sites
RTL/main.py:153-154, 345-350 and RTL/run_camera.py:94-96) —

    seg = Segmentation(...); seg(input[B,3,512,512], scaled_boxes)
        -> (segm[B,4,512,512], bboxes, probs)

where segm channels 0:3 are the RGB normalized to [-1, 1] and channel 3 is
an alpha matte in [0, 1]; bboxes are per-instance [x1, y1, x2, y2]; probs
are detection confidences. Internally the reference loads two NVIDIA
torchhub models (README.md:59-60).

TPU-native rebuild (NHWC): a light encoder-decoder matting network
(``MatteNet``) that jits into the preprocessing graph, plus a weight-free
``box`` fallback (the prior box the RTL demo already uses as its detection
region, RTL/main.py:290) so the full pipeline runs without pretrained
weights — this environment has no network egress to fetch any. The
detector (human_det's role) is ``pipeline/detection.py``'s DetectNet,
trained in-repo; its boxes replace the fixed prior when its checkpoint is
present, and ``alpha_to_bbox`` still provides the per-frame instance bbox
output of the segmenter itself.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class _ConvBNRelu(nn.Module):
    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, (3, 3), strides=(self.stride,) * 2,
                    padding="SAME", use_bias=False)(x)
        x = nn.GroupNorm(num_groups=min(32, self.features), epsilon=1e-5)(x)
        return nn.relu(x)


class MatteNet(nn.Module):
    """U-Net style alpha-matte network: [B, H, W, 3] -> [B, H, W, 1] logits.

    Small enough for real-time (~2M params at width=32) while matching the
    (rgb, alpha) contract of the reference's segmenter.
    """
    width: int = 32

    @nn.compact
    def __call__(self, x):
        w = self.width
        skips = []
        for i, mult in enumerate((1, 2, 4, 8)):
            x = _ConvBNRelu(w * mult, stride=1)(x)
            skips.append(x)
            x = _ConvBNRelu(w * mult, stride=2)(x)
        x = _ConvBNRelu(w * 8)(x)
        for mult, skip in zip((8, 4, 2, 1), reversed(skips)):
            b, h, wd, c = skip.shape
            x = jax.image.resize(x, (b, h, wd, x.shape[-1]), "bilinear")
            x = jnp.concatenate([x, skip], axis=-1)
            x = _ConvBNRelu(w * mult)(x)
        return nn.Conv(1, (3, 3), padding="SAME")(x)


def alpha_to_bbox(alpha: jax.Array, threshold: float = 0.5):
    """[B, H, W] alpha -> ([B, 4] xyxy bbox, [B] mean confidence).

    Static-shape reduction replacing the reference's detector output; rows/
    cols are reduced with masked min/max (no nonzero()).
    """
    b, h, w = alpha.shape
    mask = alpha > threshold
    any_row = mask.any(axis=2)           # [B, H]
    any_col = mask.any(axis=1)           # [B, W]
    rows = jnp.arange(h)
    cols = jnp.arange(w)
    big = jnp.iinfo(jnp.int32).max
    y1 = jnp.min(jnp.where(any_row, rows, big), axis=1)
    y2 = jnp.max(jnp.where(any_row, rows, -1), axis=1)
    x1 = jnp.min(jnp.where(any_col, cols, big), axis=1)
    x2 = jnp.max(jnp.where(any_col, cols, -1), axis=1)
    found = mask.any(axis=(1, 2))
    bbox = jnp.stack([x1, y1, x2, y2], axis=1)
    bbox = jnp.where(found[:, None], bbox, 0).astype(jnp.float32)
    denom = jnp.maximum(mask.sum(axis=(1, 2)), 1)
    probs = jnp.where(found, alpha.sum(axis=(1, 2)) / denom, 0.0)
    return bbox, probs


def _box_mask(shape, box, h, w):
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    x1, y1, x2, y2 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    m = ((xs >= x1[:, None, None]) & (xs <= x2[:, None, None])
         & (ys >= y1[:, None, None]) & (ys <= y2[:, None, None]))
    return m.astype(jnp.float32)


class Segmentation:
    """Callable matching the reference's Segmentation contract (NHWC).

    Args:
      variables: MatteNet params ({'params': ...}); None -> 'box' fallback.
      scaled_boxes: default detection-region prior [1, 4] xyxy
        (RTL/main.py:290 uses [[50, 0, 450, 500]] on 512x512 frames).
      detector: optional ``Detection`` (pipeline/detection.py); when set
        and no explicit scaled_boxes are passed per call, the detection
        region comes from the detector instead of the fixed prior —
        mirroring the reference, where human_det's boxes feed
        human_inst_seg (RTL/main.py:345-350).
    """

    def __init__(self, variables=None, width: int = 32,
                 scaled_boxes: Optional[Sequence[float]] = None,
                 detector=None):
        self.net = MatteNet(width=width) if variables is not None else None
        self.variables = variables
        self.detector = detector
        self.default_box = jnp.asarray(
            [scaled_boxes or [50.0, 0.0, 450.0, 500.0]], jnp.float32)
        self._call = jax.jit(self._impl)

    @classmethod
    def load_default(cls, ckpt_path: Optional[str] = None,
                     scaled_boxes: Optional[Sequence[float]] = None
                     ) -> "Segmentation":
        """Segmentation with the committed in-repo MatteNet weights
        (trained by apps/train_matting.py); box-prior fallback if the
        checkpoint is absent. Mirrors the reference's implicit 'weights are
        downloaded and just load' contract (README.md:59-60)."""
        import os

        from .detection import Detection

        detector = Detection.load_default()
        if ckpt_path is None:
            ckpt_path = os.path.join(os.path.dirname(__file__), os.pardir,
                                     "data", "mattenet.npz")
        if not os.path.exists(ckpt_path):
            return cls(variables=None, scaled_boxes=scaled_boxes,
                       detector=detector)
        from ..training.matting import load_params

        params, width = load_params(ckpt_path)
        return cls(variables=params, width=width, scaled_boxes=scaled_boxes,
                   detector=detector)

    def _impl(self, images: jax.Array, boxes: jax.Array):
        b, h, w, _ = images.shape
        prior = _box_mask((b, h, w), boxes, h, w)
        if self.net is not None:
            logits = self.net.apply(self.variables, images * 2.0 - 1.0)
            alpha = jax.nn.sigmoid(logits[..., 0]) * prior
        else:
            alpha = prior
        rgb = images * 2.0 - 1.0
        segm = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
        bbox, probs = alpha_to_bbox(alpha)
        return segm, bbox, probs

    def __call__(self, images: jax.Array, scaled_boxes=None):
        """images: [B, H, W, 3] RGB in [0, 1] -> (segm [B, H, W, 4],
        bboxes [B, 4], probs [B])."""
        if scaled_boxes is not None:
            boxes = jnp.asarray(scaled_boxes, jnp.float32)
        elif self.detector is not None:
            boxes = self.detector.person_box(
                images, fallback=self.default_box[0])
        else:
            boxes = self.default_box
        if boxes.ndim == 1:
            boxes = boxes[None]
        boxes = jnp.broadcast_to(boxes, (images.shape[0], 4))
        return self._call(images, boxes)


def matting_loss(variables, net: MatteNet, images: jax.Array,
                 alpha_gt: jax.Array) -> jax.Array:
    """Training loss for MatteNet: BCE + gradient (edge) consistency."""
    logits = net.apply(variables, images * 2.0 - 1.0)[..., 0]
    bce = optax_sigmoid_bce(logits, alpha_gt).mean()
    alpha = jax.nn.sigmoid(logits)
    gx = jnp.abs(jnp.diff(alpha, axis=2)) - jnp.abs(jnp.diff(alpha_gt, axis=2))
    gy = jnp.abs(jnp.diff(alpha, axis=1)) - jnp.abs(jnp.diff(alpha_gt, axis=1))
    return bce + 0.5 * (jnp.abs(gx).mean() + jnp.abs(gy).mean())


def optax_sigmoid_bce(logits, labels):
    import optax
    return optax.sigmoid_binary_cross_entropy(logits, labels)
