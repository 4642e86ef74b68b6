"""Backbone registry (the reference's IMF dispatch, backbones/__init__.py)."""

from .hourglass import HGFilter, PIFuHGFilters, ConvBlock, HourGlass
from .resnet import ResnetFilter, PIFuResBlkFilters, ResnetBlock

BACKBONES = {
    "PIFuHGFilters": PIFuHGFilters,
    "PIFuResBlkFilters": PIFuResBlkFilters,
}

__all__ = ["HGFilter", "PIFuHGFilters", "ConvBlock", "HourGlass",
           "ResnetFilter", "PIFuResBlkFilters", "ResnetBlock", "BACKBONES"]
