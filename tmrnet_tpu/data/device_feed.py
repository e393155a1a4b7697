"""Host->device feed: double-buffered prefetch of loader batches into HBM.

The jitted step should never wait on a host->device copy: while step i
computes, batch i+1's transfer is already in flight (jax.device_put is async).
With a mesh, batches land pre-sharded across the data axis, so the SPMD step
consumes them without any resharding. This is the TPU analogue of the
reference's pinned-memory DataLoader workers.
"""

from __future__ import annotations

from collections import deque
from typing import Iterable, Iterator, Optional, Tuple

import jax
import numpy as np


def device_prefetch(
    batches: Iterable,
    mesh=None,
    buffer_size: int = 2,
    array_indices: Optional[Tuple[int, ...]] = None,
) -> Iterator:
    """Wrap a batch iterator; numpy items (or those at array_indices) are
    device_put ahead of consumption. Non-array items pass through."""
    sharding = None
    if mesh is not None:
        from tmrnet_tpu.parallel.mesh import batch_sharding

        sharding = batch_sharding(mesh)

    def put(item, idx):
        if array_indices is not None and idx not in array_indices:
            return item
        if isinstance(item, np.ndarray):
            if sharding is not None and item.ndim >= 1:
                return jax.device_put(item, sharding)
            return jax.device_put(item)
        return item

    queue: deque = deque()
    it = iter(batches)
    try:
        for _ in range(buffer_size):
            batch = next(it)
            queue.append(tuple(put(x, i) for i, x in enumerate(batch)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            batch = next(it)
            queue.append(tuple(put(x, i) for i, x in enumerate(batch)))
        except StopIteration:
            pass
        yield out
