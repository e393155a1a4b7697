"""Jitted train/eval steps.

One fused XLA program per step: forward (bf16-capable), last-frame
class-weighted CE (reference scores only each clip's final frame,
`train_singlenet_phase_1fc.py:551-566`), backward, two-group optimizer update,
BN running-stat update. The TrainState is donated, so parameters and optimizer
state update in place in HBM.

Stage-2 steps additionally take the (B, window, hidden) memory gathered from
the HBM feature bank (see tmrnet_tpu.memory.lfb) — the gather itself can be
composed into the same jit by the caller.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from tmrnet_tpu.train.losses import weighted_cross_entropy
from tmrnet_tpu.train.state import TrainState


def _make_steps(class_weights, loss_reduction: str = "sum",
                label_smoothing: float = 0.0, donate: bool = True,
                prep: Optional[Callable] = None):
    # stage-1 and stage-2 steps share this body: the *inputs splat carries
    # (clips,) or (clips, memory) transparently
    w = None if class_weights is None else jnp.asarray(class_weights)
    ls = float(label_smoothing)

    def _prep(inputs):
        # data.device_normalize extended to TRAINING: clips arrive as raw
        # uint8 (4x fewer host->device bytes than normalized f32) and the
        # (x - mean)/std runs inside this jit, fused into the first conv's
        # input transform — the same shared wire convention every
        # inference engine uses (data/device_feed.py::DevicePrep)
        if prep is None:
            return inputs
        return (prep(inputs[0]),) + tuple(inputs[1:])

    def forward_train(state: TrainState, params, inputs, labels, rng):
        inputs = _prep(inputs)
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, updates = state.apply_fn(
            variables, *inputs, train=True, rngs={"dropout": rng},
            mutable=["batch_stats"])
        logits = out[:, -1, :] if out.ndim == 3 else out
        loss = weighted_cross_entropy(logits, labels, w, loss_reduction,
                                      label_smoothing=ls)
        return loss, (updates["batch_stats"], logits)

    @partial(jax.jit, donate_argnums=(0,) if donate else ())
    def train_step(state: TrainState, *args):
        *inputs, labels, rng = args
        grad_fn = jax.value_and_grad(forward_train, argnums=1, has_aux=True)
        (loss, (new_bs, logits)), grads = grad_fn(
            state, state.params, tuple(inputs), labels, rng)
        state = state.apply_gradients(grads, new_bs)
        preds = jnp.argmax(logits, axis=-1)
        valid = labels >= 0  # negative labels mark batch padding
        metrics = {
            "loss": loss,
            "correct": ((preds == labels) & valid).sum(),
            "count": valid.sum().astype(jnp.int32),
        }
        return state, metrics

    @jax.jit
    def eval_step(state: TrainState, *args):
        *inputs, labels = args
        out = state.apply_fn(state.variables, *_prep(tuple(inputs)),
                             train=False)
        logits = out[:, -1, :] if out.ndim == 3 else out
        loss = weighted_cross_entropy(logits, labels, w, loss_reduction,
                                      label_smoothing=ls)
        preds = jnp.argmax(logits, axis=-1)
        valid = labels >= 0  # negative labels mark batch padding
        return {
            "loss": loss,
            # per-sample losses let the host mask batch padding exactly
            "losses": weighted_cross_entropy(logits, labels, w, "none",
                                             label_smoothing=ls),
            "correct": ((preds == labels) & valid).sum(),
            "count": valid.sum().astype(jnp.int32),
            "preds": preds,
            "probs": jax.nn.softmax(logits.astype(jnp.float32), axis=-1),
        }

    return train_step, eval_step


def make_stage1_steps(class_weights=None, loss_reduction: str = "sum",
                      label_smoothing: float = 0.0, donate: bool = True,
                      prep: Optional[Callable] = None
                      ) -> Tuple[Callable, Callable]:
    """Steps for MemoryBankModel: train_step(state, clips, labels, rng),
    eval_step(state, clips, labels). labels are per-clip last-frame labels.
    prep: optional in-jit wire-dtype cast + normalize applied to clips
    (DevicePrep, for the uint8 training feed)."""
    return _make_steps(class_weights, loss_reduction, label_smoothing,
                       donate, prep)


def make_stage2_steps(class_weights=None, loss_reduction: str = "sum",
                      label_smoothing: float = 0.0, donate: bool = True,
                      prep: Optional[Callable] = None
                      ) -> Tuple[Callable, Callable]:
    """Steps for TMRNet: train_step(state, clips, memory, labels, rng),
    eval_step(state, clips, memory, labels). prep as in make_stage1_steps."""
    return _make_steps(class_weights, loss_reduction, label_smoothing,
                       donate, prep)
