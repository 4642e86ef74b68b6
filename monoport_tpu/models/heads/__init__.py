"""Head registry (the reference's IMF dispatch, heads/__init__.py)."""

from .surface_classifier import SurfaceClassifier, PIFuNetGMLP, PIFuNetCMLP

HEADS = {
    "PIFuNetGMLP": PIFuNetGMLP,
    "PIFuNetCMLP": PIFuNetCMLP,
}

# (filter_channels, last_op) per head — used to pack the Pallas fused-MLP
# kernel (ops/pallas/fused_mlp.py) for the inference hot path
HEAD_SPECS = {
    "PIFuNetGMLP": ((257, 1024, 512, 256, 128, 1), "sigmoid"),
    "PIFuNetCMLP": ((513, 1024, 512, 256, 128, 3), "tanh"),
}

__all__ = ["SurfaceClassifier", "PIFuNetGMLP", "PIFuNetCMLP", "HEADS",
           "HEAD_SPECS"]
