"""monoport_tpu — TPU-native monocular volumetric performance capture.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
Project-Splinter/MonoPort (SIGGRAPH 2020 RTL): pixel-aligned implicit
function networks (PIFu netG/netC), hierarchical lossless surface
localization, visible-surface depth peeling and colorization, a streaming
real-time pipeline, and training infrastructure — designed TPU-first
(NHWC layouts, static shapes, pjit sharding, Pallas hot kernels).
"""

__version__ = "0.1.0"

from .config import CfgNode, CN, get_cfg_defaults

__all__ = ["CfgNode", "CN", "get_cfg_defaults", "__version__"]
