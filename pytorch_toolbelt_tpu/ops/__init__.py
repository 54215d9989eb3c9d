from .tile_merge import pallas_accumulate_tiles, pallas_available, pallas_merge_supported

__all__ = ["pallas_accumulate_tiles", "pallas_available", "pallas_merge_supported"]
