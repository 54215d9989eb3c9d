from .conv_kernels import conv3x3_eligible, conv3x3_hcw, fold_batchnorm, pack_conv3x3_weights
from .sort import bitonic_sort_chunked, chunked_sort_supported, split_sort, split_sort_supported
from .tile_merge import (
    detect_regular_grid,
    grid_merge_supported,
    pallas_accumulate_tiles,
    pallas_available,
    pallas_grid_merge,
    pallas_merge_supported,
)

__all__ = [
    "bitonic_sort_chunked",
    "conv3x3_eligible",
    "conv3x3_hcw",
    "fold_batchnorm",
    "pack_conv3x3_weights",
    "chunked_sort_supported",
    "split_sort",
    "split_sort_supported",
    "detect_regular_grid",
    "grid_merge_supported",
    "pallas_accumulate_tiles",
    "pallas_available",
    "pallas_grid_merge",
    "pallas_merge_supported",
]
