from .mesh import (
    batch_sharding,
    batch_spatial_sharding,
    get_rank,
    get_world_size,
    is_main_process,
    make_mesh,
    master_print,
    replicated,
    scale_learning_rate_for_ddp,
)

__all__ = [
    "batch_sharding",
    "batch_spatial_sharding",
    "get_rank",
    "get_world_size",
    "is_main_process",
    "make_mesh",
    "master_print",
    "replicated",
    "scale_learning_rate_for_ddp",
]
