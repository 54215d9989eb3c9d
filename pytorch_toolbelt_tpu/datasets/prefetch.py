"""Host -> device input pipelining.

The torch reference leans on ``DataLoader(pin_memory=True, num_workers=N)``
to overlap host batch preparation with GPU compute.  The TPU/JAX equivalent
is explicit: keep ONE batch in flight — transfer batch k+1 (optionally
already placed on a mesh sharding) while the jitted step consumes batch k.
JAX's async dispatch does the rest: ``device_put`` returns immediately and
the copy overlaps with the running computation.

Typical loop::

    for batch in prefetch_to_device(loader, sharding=batch_sharding(mesh, 4)):
        state, loss = train_step(state, batch)

``loader`` is any iterable of numpy-array pytrees (a torch DataLoader with
``collate_fn=default_collate`` works as-is).
"""

from collections import deque
from typing import Any, Iterable, Iterator, Optional

import jax

__all__ = ["prefetch_to_device"]


def prefetch_to_device(
    iterable: Iterable[Any],
    size: int = 2,
    sharding: Optional[Any] = None,
    devices: Optional[Any] = None,
) -> Iterator[Any]:
    """Yield items of ``iterable`` as device arrays, keeping up to ``size``
    transfers in flight ahead of the consumer.

    Args:
        iterable: yields pytrees of host (numpy) arrays.
        size: prefetch depth; 2 = classic double buffering (enough when the
            step time exceeds the transfer time, the common case).
        sharding: optional ``jax.sharding.Sharding`` (e.g.
            ``batch_sharding(mesh, ndim)``) applied to every leaf — batches
            land already distributed across the mesh.
        devices: optional single device (mutually exclusive with sharding).

    Capability analogue of the reference's pinned-memory DataLoader usage
    (README training loops); there is no reference source counterpart —
    torch hides this inside DataLoader workers.
    """
    if sharding is not None and devices is not None:
        raise ValueError("pass either sharding or devices, not both")
    target = sharding if sharding is not None else devices

    def put(item):
        if target is None:
            return jax.tree_util.tree_map(jax.device_put, item)
        return jax.tree_util.tree_map(lambda leaf: jax.device_put(leaf, target), item)

    queue: deque = deque()
    it = iter(iterable)
    try:
        for _ in range(max(1, size)):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
