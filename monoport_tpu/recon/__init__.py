from .calib import pifu_calib
from .dense import dense_eval, grid_points
from .hierarchy import HierarchicalRecon
from .depth_peel import colorize, depth_peel, shade_normal, visualize
from .marching import extract_mesh, marching_tets
from .ray_refine import ray_refine

__all__ = ["pifu_calib", "dense_eval", "grid_points", "HierarchicalRecon",
           "depth_peel", "shade_normal", "colorize", "visualize",
           "extract_mesh", "marching_tets", "ray_refine"]
