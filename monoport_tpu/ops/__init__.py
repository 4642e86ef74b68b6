from .sampling import grid_sample_2d, index
from .projection import orthogonal, perspective, PROJECTIONS
from .resize import (interpolate_2d, interpolate_3d, upsample2x_bicubic,
                     avg_pool_2d, resize_axis)

__all__ = ["grid_sample_2d", "index", "orthogonal", "perspective",
           "PROJECTIONS", "interpolate_2d", "interpolate_3d",
           "upsample2x_bicubic", "avg_pool_2d", "resize_axis"]
