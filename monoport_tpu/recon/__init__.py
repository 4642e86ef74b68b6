from .calib import pifu_calib
from .dense import dense_eval, grid_points
from .hierarchy import HierarchicalRecon
from .depth_peel import depth_peel, shade_normal, visualize

__all__ = ["pifu_calib", "dense_eval", "grid_points", "HierarchicalRecon",
           "depth_peel", "shade_normal", "visualize"]
