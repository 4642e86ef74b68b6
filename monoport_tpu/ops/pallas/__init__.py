from .fused_mlp import PallasSurfaceMLP, pack_mlp_params

__all__ = ["PallasSurfaceMLP", "pack_mlp_params"]
