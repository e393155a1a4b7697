"""Losses: class-weighted cross entropy on the clip's last frame.

The reference uses sklearn 'balanced' class weights fed into a
CrossEntropyLoss(reduction='sum') and scores only the last frame of each clip
(`train_memorybank.py:205-221`, `train_singlenet_phase_1fc.py:551-566`).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def balanced_class_weights(labels: np.ndarray, num_classes: int) -> np.ndarray:
    """sklearn.utils.class_weight.compute_class_weight('balanced') semantics:
    w_c = n_samples / (n_classes * count_c). Classes absent from the data get
    weight 0 (sklearn would error; absent classes contribute no loss anyway)."""
    labels = np.asarray(labels).ravel()
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    n_present = int((counts > 0).sum())  # sklearn divides by len(classes) present
    with np.errstate(divide="ignore"):
        w = labels.size / (max(n_present, 1) * counts)
    w[~np.isfinite(w)] = 0.0
    return w.astype(np.float32)


def weighted_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    reduction: str = "sum",
    label_smoothing: float = 0.0,
) -> jax.Array:
    """CE over (..., num_classes) logits with per-class weights.

    reduction='sum' matches torch CrossEntropyLoss(weight=..., reduction='sum');
    'mean' is the torch weighted mean (sum / sum of sample weights).
    """
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / num_classes
    per_sample = -(onehot * logp).sum(axis=-1)
    # negative labels mark batch padding: zero loss and zero sample weight
    valid = (labels >= 0).astype(jnp.float32)
    per_sample = per_sample * valid
    if class_weights is not None:
        w = jnp.take(jnp.asarray(class_weights, jnp.float32),
                     jnp.maximum(labels, 0)) * valid
        per_sample = per_sample * w
    else:
        w = valid
    if reduction == "sum":
        return per_sample.sum()
    if reduction == "mean":
        return per_sample.sum() / jnp.maximum(w.sum(), 1e-12)
    if reduction == "none":
        return per_sample
    raise ValueError(f"unknown reduction {reduction!r}")
