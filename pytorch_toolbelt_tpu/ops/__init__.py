from .tile_merge import pallas_accumulate_tiles, pallas_available

__all__ = ["pallas_accumulate_tiles", "pallas_available"]
