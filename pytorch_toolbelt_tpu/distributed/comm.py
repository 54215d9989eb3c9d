"""Cross-process communication helpers — TPU-native replacement for the
reference's NCCL/pickle layer (pytorch_toolbelt/utils/distributed.py:40-342).

Device-side collectives belong INSIDE pjit (lax.psum etc.); these helpers
cover the host-level object plumbing the reference provided: generic object
all-gather, master broadcast, dict reduction, work splitting across
processes, and the process-group guard.
"""

import functools
import logging
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from ..utils.bucket_assignment import filler_bucket_assignment
from .mesh import get_rank, get_world_size, is_main_process, master_print

logger = logging.getLogger(__name__)

__all__ = [
    "DistributedGuard",
    "all_gather",
    "broadcast_from_master",
    "reduce_dict_sum",
    "split_across_nodes",
    "master_node_only",
    "is_dist_avail_and_initialized",
]


def is_dist_avail_and_initialized() -> bool:
    """True when running multi-process (reference distributed.py:79-93)."""
    return jax.process_count() > 1


def all_gather(data: Any) -> List[Any]:
    """Gather an arbitrary picklable object from every process
    (reference distributed.py:155-195 pickles through NCCL; here
    multihost_utils rides the JAX distributed runtime)."""
    if not is_dist_avail_and_initialized():
        return [data]
    from jax.experimental import multihost_utils
    import pickle

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8)
    sizes = multihost_utils.process_allgather(np.array([payload.size]))
    max_size = int(np.max(sizes))
    padded = np.zeros(max_size, dtype=np.uint8)
    padded[: payload.size] = payload
    gathered = multihost_utils.process_allgather(padded)
    return [
        pickle.loads(gathered[i, : int(sizes[i])].tobytes()) for i in range(jax.process_count())
    ]


def broadcast_from_master(data: Any) -> Any:
    """Broadcast a picklable object from process 0 to all processes
    (reference distributed.py:111-152)."""
    if not is_dist_avail_and_initialized():
        return data
    from jax.experimental import multihost_utils
    import pickle

    payload = np.frombuffer(pickle.dumps(data), dtype=np.uint8) if is_main_process() else np.zeros(0, np.uint8)
    size = multihost_utils.broadcast_one_to_all(np.array([payload.size]))
    buf = np.zeros(int(size[0]), dtype=np.uint8)
    if is_main_process():
        buf[:] = payload
    buf = multihost_utils.broadcast_one_to_all(buf)
    return pickle.loads(np.asarray(buf).tobytes())


def reduce_dict_sum(input_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Element-wise sum of dict values across processes
    (reference distributed.py:198-222)."""
    if not is_dist_avail_and_initialized():
        return input_dict
    gathered = all_gather(input_dict)
    result: Dict[str, Any] = {}
    for d in gathered:
        for key, value in d.items():
            if key in result:
                result[key] = result[key] + value
            else:
                result[key] = value
    return result


def split_across_nodes(
    collection: Sequence,
    costs: Optional[np.ndarray] = None,
    rank: Optional[int] = None,
    world_size: Optional[int] = None,
) -> List:
    """Partition work items across processes: even slices, or cost-balanced
    greedy buckets when per-item costs are given
    (reference distributed.py:240-316 + bucket_assignment.py)."""
    if world_size is None:
        world_size = jax.process_count()
    if rank is None:
        rank = get_rank()
    if world_size == 1:
        return list(collection)

    if costs is not None:
        if len(costs) != len(collection):
            raise ValueError("costs must have the same length as the collection")
        assignment = filler_bucket_assignment(np.asarray(costs, dtype=np.float64), world_size)
        return [item for item, bucket in zip(collection, assignment) if bucket == rank]

    return list(collection[rank::world_size])


class DistributedGuard:
    """Context manager initializing/finalizing the JAX distributed runtime —
    the analogue of the reference's NCCL process-group guard
    (distributed.py:40-76). No-op in single-process runs."""

    def __init__(self, coordinator_address: Optional[str] = None,
                 num_processes: Optional[int] = None, process_id: Optional[int] = None):
        self.coordinator_address = coordinator_address
        self.num_processes = num_processes
        self.process_id = process_id
        self._initialized_here = False

    def __enter__(self):
        if self.coordinator_address is not None and jax.process_count() == 1:
            jax.distributed.initialize(
                coordinator_address=self.coordinator_address,
                num_processes=self.num_processes,
                process_id=self.process_id,
            )
            self._initialized_here = True
        logger.info("DistributedGuard: %d processes, rank %d", jax.process_count(), get_rank())
        return self

    def __exit__(self, exc_type, exc_val, exc_tb):
        if self._initialized_here:
            jax.distributed.shutdown()
        return False


def master_node_only(func=None, *, default=None):
    """Decorator: run the function only on the main process
    (reference distributed.py:319-342)."""

    def decorator(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            if is_main_process():
                return f(*args, **kwargs)
            return default

        return wrapper

    if func is not None:
        return decorator(func)
    return decorator
