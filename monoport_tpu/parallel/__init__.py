from .mesh import make_mesh, batch_sharding, replicated
from .train_step import TrainState, create_train_state, make_train_step

__all__ = ["make_mesh", "batch_sharding", "replicated", "TrainState",
           "create_train_state", "make_train_step"]
