"""Long-term Feature Bank (LFB), TPU-native.

The reference builds the LFB by running the frozen extractor over every clip,
copying each 512-d feature to host one row at a time and O(n^2)-reallocating a
numpy array, then pickling it (`train_non-local_mutiConv_resnet.py:679-768`).
Here the bank is an HBM-resident `(num_rows, feature_dim)` jax array written
in-place by a jitted donated scatter, and the per-clip memory window
(`get_long_feature`, reference `:298-326`) is a device-side gather:

    rows_window = max(row - k, first_row_of_video)   k = 1..window
    lt = bank[rows_window]                            # jnp.take, on device

so stage-2 training and inference never bounce features through the host.
A compressed .npz disk cache replaces the `--load_LFB` pickle workflow.
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial
from typing import Callable, Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tmrnet_tpu.data.indexing import (
    clips_per_video,
    memory_window_rows,
    memory_window_rows_reference,
    video_first_rows,
)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class FeatureBank:
    """HBM-resident bank + row bookkeeping.

    features:   (num_rows, feature_dim)
    first_rows: (num_rows,) first bank row of each row's video — precomputed
                per-row so window gathers need no row->video lookup on device.
    """

    features: jax.Array
    first_rows: jax.Array

    @property
    def num_rows(self) -> int:
        return self.features.shape[0]

    @property
    def feature_dim(self) -> int:
        return self.features.shape[1]

    def tree_flatten(self):
        return (self.features, self.first_rows), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @staticmethod
    def create(seq_len: int, video_lengths: Sequence[int], feature_dim: int,
               dtype=jnp.float32) -> "FeatureBank":
        cpv = clips_per_video(seq_len, video_lengths)
        n = int(cpv.sum())
        firsts = video_first_rows(seq_len, video_lengths)
        per_row_first = np.repeat(firsts, cpv)[:n]
        return FeatureBank(
            features=jnp.zeros((n, feature_dim), dtype),
            first_rows=jnp.asarray(per_row_first, jnp.int32),
        )


@partial(jax.jit, donate_argnums=(0,))
def update_bank(features: jax.Array, rows: jax.Array,
                values: jax.Array) -> jax.Array:
    """In-place (donated) scatter of freshly extracted clip features."""
    return features.at[rows].set(values.astype(features.dtype))


@partial(jax.jit, static_argnums=(3,))
def gather_memory_windows(features: jax.Array, rows: jax.Array,
                          first_rows: jax.Array, window: int) -> jax.Array:
    """Device-side memory-window gather: (B,) rows -> (B, window, F), most
    recent clip first, clamped at each video's first row.

    CONTRACT: first_rows is BATCH-ALIGNED — first_rows[i] is the first row
    of rows[i]'s video, i.e. callers index the per-row table first
    (`ds.first_rows[rows]`). Do NOT pass FeatureBank.first_rows (length
    num_rows) directly: with B == num_rows and shuffled rows it would
    silently pair row i with the wrong video's clamp."""
    idx = memory_window_rows(rows, first_rows, window)  # (B, window)
    return jnp.take(features, idx, axis=0)


def gather_memory_windows_reference(
    bank: FeatureBank,
    start_frames: Sequence[int],
    seq_len: int,
    video_lengths: Sequence[int],
    window: int,
) -> jax.Array:
    """Reference-quirk-compatible gather (cross-video lookback) for parity
    runs; indices computed host-side, gather on device."""
    idx = memory_window_rows_reference(start_frames, seq_len, video_lengths, window)
    return jnp.take(bank.features, jnp.asarray(idx), axis=0)


def build_feature_bank(
    extract_fn: Callable[[jax.Array], jax.Array],
    batches: Iterable[Tuple[np.ndarray, np.ndarray]],
    seq_len: int,
    video_lengths: Sequence[int],
    feature_dim: int,
    dtype=jnp.float32,
) -> FeatureBank:
    """Streaming on-device build.

    extract_fn: jitted (B, T, H, W, 3) -> (B, feature_dim) frozen extractor.
    batches: yields (clips, rows) — host batches and the bank rows they fill.
    """
    bank = FeatureBank.create(seq_len, video_lengths, feature_dim, dtype)
    feats = bank.features
    for clips, rows in batches:
        values = extract_fn(jnp.asarray(clips))
        feats = update_bank(feats, jnp.asarray(rows, jnp.int32), values)
    return FeatureBank(features=feats, first_rows=bank.first_rows)


def save_bank(path: str, bank: FeatureBank) -> None:
    """Disk cache. Native format is .npz (features + first_rows); a
    .pkl/.pickle path writes the REFERENCE's g_LFB format instead (a pickled
    float32 numpy array, `train_non-local_mutiConv_resnet.py:752-756`) so
    banks built here feed the PyTorch reference's --load_LFB workflow."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    if path.endswith((".pkl", ".pickle")):
        import pickle

        with open(path, "wb") as f:
            pickle.dump(np.asarray(bank.features, np.float32), f)
        return
    np.savez_compressed(path, features=np.asarray(bank.features),
                        first_rows=np.asarray(bank.first_rows))


def load_bank(path: str, dtype=jnp.float32, seq_len: Optional[int] = None,
              video_lengths: Optional[Sequence[int]] = None) -> FeatureBank:
    """Load a bank cache. Native format is the .npz written by save_bank; a
    .pkl/.pickle path loads the REFERENCE's g_LFB_* artifact (a pickled
    (num_rows, 512) numpy array or torch tensor,
    `train_non-local_mutiConv_resnet.py:752-765`) so existing banks migrate
    without re-running the extractor. For pickles, pass seq_len +
    video_lengths to validate the row count and rebuild first_rows
    (window gathers read first rows from the DATASET, so zeros are safe
    when the layout is unknown)."""
    if path.endswith((".pkl", ".pickle")):
        import pickle

        with open(path, "rb") as f:
            arr = pickle.load(f)
        if hasattr(arr, "detach"):
            arr = arr.detach().cpu().numpy()
        arr = np.asarray(arr)
        if arr.ndim != 2:
            raise ValueError(f"{path}: expected a 2-D feature array, "
                             f"got shape {arr.shape}")
        if seq_len is not None and video_lengths is not None:
            cpv = clips_per_video(seq_len, video_lengths)
            want = int(cpv.sum())
            if want != arr.shape[0]:
                raise ValueError(
                    f"{path}: {arr.shape[0]} rows but the manifest implies "
                    f"{want} clip positions (sum of len+1-seq per video) — "
                    f"wrong bank for this dataset/seq_len")
            firsts = np.repeat(video_first_rows(seq_len, video_lengths),
                               cpv)[:want]
        else:
            firsts = np.zeros((arr.shape[0],), np.int64)
        return FeatureBank(features=jnp.asarray(arr, dtype),
                           first_rows=jnp.asarray(firsts, jnp.int32))
    with np.load(path) as z:
        return FeatureBank(features=jnp.asarray(z["features"], dtype),
                           first_rows=jnp.asarray(z["first_rows"], jnp.int32))
