from .torch_loader import (convert_backbone_state, convert_head_state,
                           convert_monoport_state, load_legacy_pifu)

__all__ = ["convert_backbone_state", "convert_head_state",
           "convert_monoport_state", "load_legacy_pifu"]
