from .synthetic import SyntheticBlobDataset
from .ppl import PPLDynamicDataset, PPLStaticDataset
from .utils import load_image, projection, make_batches

__all__ = ["SyntheticBlobDataset", "PPLDynamicDataset", "PPLStaticDataset",
           "load_image", "projection", "make_batches"]
