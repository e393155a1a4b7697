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

    def stage(batch):
        if isinstance(batch, np.ndarray):
            # enumerate() would silently explode a bare array batch into
            # per-row device_puts (B tuple elements of the wrong rank)
            raise TypeError(
                "device_prefetch expects each batch to be a tuple/list of "
                "items; wrap a bare array batch as (array,)")
        return tuple(put(x, i) for i, x in enumerate(batch))

    queue: deque = deque()
    it = iter(batches)
    try:
        for _ in range(buffer_size):
            queue.append(stage(next(it)))
    except StopIteration:
        pass
    while queue:
        out = queue.popleft()
        try:
            queue.append(stage(next(it)))
        except StopIteration:
            pass
        yield out


class DevicePrep:
    """The single in-jit wire convention, shared by every engine
    (ClipInference, VideoInference, StreamingInference, build_lfb):
    uint8 frames cast to the compute dtype and, under
    data.device_normalize, get (x - mean*255)/(std*255) fused into the
    first conv's input transform by XLA; float frames only cast. One
    definition so a wire-format change can never skew a single engine."""

    def __init__(self, data_cfg, compute_dtype):
        import jax.numpy as jnp

        self.cdt = jnp.dtype(compute_dtype)
        self.mean = jnp.asarray(data_cfg.mean, self.cdt) * 255.0
        self.std = jnp.asarray(data_cfg.std, self.cdt) * 255.0
        self.dev_norm = data_cfg.device_normalize

    def __call__(self, frames):
        import jax.numpy as jnp

        if frames.dtype == jnp.uint8:
            frames = frames.astype(self.cdt)
            if self.dev_norm:
                frames = (frames - self.mean) / self.std
        elif frames.dtype != self.cdt:
            frames = frames.astype(self.cdt)
        return frames
