from .comm import (
    DistributedGuard,
    all_gather,
    broadcast_from_master,
    is_dist_avail_and_initialized,
    master_node_only,
    reduce_dict_sum,
    split_across_nodes,
)
from .tiled import clear_sharded_cache, read_sharded_window, tiled_apply_sharded
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
    "DistributedGuard",
    "all_gather",
    "broadcast_from_master",
    "is_dist_avail_and_initialized",
    "master_node_only",
    "reduce_dict_sum",
    "split_across_nodes",
    "clear_sharded_cache",
    "read_sharded_window",
    "tiled_apply_sharded",
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
