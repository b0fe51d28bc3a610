from .mesh import make_mesh, shard_params_for_tp, batch_sharding
from .sharded_inference import sharded_window_inference

__all__ = [
    "make_mesh",
    "shard_params_for_tp",
    "batch_sharding",
    "sharded_window_inference",
]
