from .monoport_net import MonoPortNet, PIFuNetG, PIFuNetC
from .backbones import BACKBONES
from .heads import HEADS

__all__ = ["MonoPortNet", "PIFuNetG", "PIFuNetC", "BACKBONES", "HEADS"]
