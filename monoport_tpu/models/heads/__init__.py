"""Head registry (the reference's IMF dispatch, heads/__init__.py)."""

from .surface_classifier import SurfaceClassifier, PIFuNetGMLP, PIFuNetCMLP

HEADS = {
    "PIFuNetGMLP": PIFuNetGMLP,
    "PIFuNetCMLP": PIFuNetCMLP,
}

__all__ = ["SurfaceClassifier", "PIFuNetGMLP", "PIFuNetCMLP", "HEADS"]
