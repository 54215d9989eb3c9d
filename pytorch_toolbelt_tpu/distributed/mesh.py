"""Device-mesh helpers — the TPU-native replacement for the reference's
torch.distributed/NCCL layer (reference utils/distributed.py).

The reference scales by DDP over processes; here scaling is SPMD over a
``jax.sharding.Mesh``:

* ``data``    — batch (data parallel; gradient psum rides ICI)
* ``spatial`` — image rows (spatial parallelism for huge-image tile
  pipelines; XLA inserts halo exchanges for convolutions automatically)
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "batch_spatial_sharding",
    "replicated",
    "get_world_size",
    "get_rank",
    "is_main_process",
    "master_print",
    "scale_learning_rate_for_ddp",
]


def make_mesh(
    devices: Optional[Sequence] = None,
    data_parallel: Optional[int] = None,
    spatial_parallel: int = 1,
) -> Mesh:
    """Create a (data, spatial) mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // spatial_parallel
    if data_parallel * spatial_parallel != n:
        raise ValueError(
            f"data_parallel ({data_parallel}) x spatial_parallel ({spatial_parallel}) != devices ({n})"
        )
    dev_array = np.asarray(devices).reshape(data_parallel, spatial_parallel)
    return Mesh(dev_array, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard axis 0 (batch) over 'data'; replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def batch_spatial_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """NHWC: batch over 'data', rows over 'spatial'."""
    spec = ["data", "spatial"] + [None] * (ndim - 2)
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def get_world_size() -> int:
    """Device count — the SPMD analogue of DDP world size
    (reference distributed.py:96)."""
    return jax.device_count()


def get_rank() -> int:
    """Process index (multi-host); 0 on a single host
    (reference distributed.py:102)."""
    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def master_print(*args, **kwargs) -> None:
    """Print only from the main process (reference distributed.py:225-237)."""
    if is_main_process():
        print(*args, **kwargs)


def scale_learning_rate_for_ddp(lr: float, world_size: Optional[int] = None) -> float:
    """Linear LR scaling by parallel width
    (reference optimization/functional.py:12-30)."""
    if world_size is None:
        world_size = get_world_size()
    return lr * world_size
