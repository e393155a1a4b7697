"""Optimizers and schedules.

Replicates the reference's optimizer semantics with optax:

* two learning-rate groups — trunk modules at lr * trunk_lr_scale (0.1), heads
  at lr (stage-1: trunk slow, lstm+fc fast, `train_singlenet_phase_1fc.py:496-507`;
  stage-2: trunk+lstm slow, time_conv/nl_block/fc_h_c/fc_c fast,
  `train_non-local_mutiConv_resnet.py:795-818`);
* torch-style SGD (momentum buffer, coupled weight decay, optional Nesterov)
  or Adam;
* StepLR and ReduceLROnPlateau, driven host-side between epochs via
  optax.inject_hyperparams (the jitted step reads the current lr from the
  optimizer state, so no recompilation on lr change).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax

from tmrnet_tpu.config import TrainConfig


def _group_of(path: Tuple[str, ...], slow_modules: Sequence[str]) -> str:
    return "slow" if path and path[0] in slow_modules else "fast"


class _DampenedTraceState(NamedTuple):
    trace: Any
    step: jax.Array  # scalar int32


def _trace_dampened(decay: float, dampening: float
                    ) -> optax.GradientTransformation:
    """torch SGD momentum with dampening (`--dampening`, SGD docs):
    buf_0 = g_0 (first step undampened), buf_t = decay*buf + (1-dampening)*g.
    optax.trace has no dampening parameter, hence this custom transform;
    torch itself forbids nesterov with nonzero dampening."""

    def init_fn(params):
        return _DampenedTraceState(
            trace=jax.tree_util.tree_map(jnp.zeros_like, params),
            step=jnp.zeros((), jnp.int32))

    def update_fn(updates, state, params=None):
        del params
        f = jnp.where(state.step == 0, 1.0, 1.0 - dampening)
        new_trace = jax.tree_util.tree_map(
            lambda g, t: g * f.astype(g.dtype) + decay * t,
            updates, state.trace)
        return new_trace, _DampenedTraceState(new_trace, state.step + 1)

    return optax.GradientTransformation(init_fn, update_fn)


def slow_modules_for_head(head: str) -> Sequence[str]:
    """The param groups each driver trains at lr * trunk_lr_scale: stage-2
    heads fine-tune backbone+encoder slowly (reference builds its optimizer
    groups the same way per driver); everything else only the backbone.

    Single source of truth shared by the trainers AND the eval restore
    template: a template whose opt_state GROUPS differ from the trainer's
    makes orbax restore the mismatched leaves from the checkpoint's own
    sharding file, which only reconstructs on the training topology — a
    stage-2 checkpoint then failed to restore for eval on any other device
    count."""
    return (("backbone", "encoder") if head in ("tmr", "nl_only")
            else ("backbone",))


def make_optimizer(cfg: TrainConfig, params: Any,
                   slow_modules: Sequence[str] = ("backbone",)
                   ) -> optax.GradientTransformation:
    """Build the two-group optimizer. `slow_modules` are top-level param-tree
    keys trained at cfg.lr * cfg.trunk_lr_scale; stage-1 passes ('backbone',),
    stage-2 passes ('backbone', 'encoder')."""
    if cfg.optimizer == "sgd" and cfg.dampening and cfg.nesterov:
        # torch parity: SGD raises on this combination (and inject_hyperparams
        # defers the inner factory, so the check must happen here, eagerly)
        raise ValueError("nesterov momentum requires zero dampening")
    labels = jax.tree_util.tree_map_with_path(
        lambda path, _: _group_of(tuple(p.key for p in path), slow_modules),
        params)

    def make_group(scale: float) -> optax.GradientTransformation:
        # Only learning_rate is injected (re-settable without recompilation);
        # the rest are Python statics baked into the compiled update.
        if cfg.optimizer == "sgd":
            def make_sgd(learning_rate):
                parts = []
                if cfg.weight_decay:
                    parts.append(optax.add_decayed_weights(cfg.weight_decay))
                if cfg.momentum:
                    if cfg.dampening:
                        parts.append(_trace_dampened(cfg.momentum,
                                                     cfg.dampening))
                    else:
                        parts.append(optax.trace(decay=cfg.momentum,
                                                 nesterov=cfg.nesterov))
                parts.append(optax.scale(-1.0 * scale))
                parts.append(optax.scale(learning_rate))
                return optax.chain(*parts)

            return optax.inject_hyperparams(make_sgd)(learning_rate=cfg.lr)
        if cfg.optimizer == "adam":
            def make_adam(learning_rate):
                parts = []
                if cfg.weight_decay:
                    parts.append(optax.add_decayed_weights(cfg.weight_decay))
                parts.append(optax.scale_by_adam())
                parts.append(optax.scale(-1.0 * scale))
                parts.append(optax.scale(learning_rate))
                return optax.chain(*parts)

            return optax.inject_hyperparams(make_adam)(learning_rate=cfg.lr)
        raise ValueError(f"unknown optimizer {cfg.optimizer!r}")

    opt = optax.multi_transform(
        {"slow": make_group(cfg.trunk_lr_scale), "fast": make_group(1.0)},
        labels)
    if cfg.grad_clip > 0:
        # clip the GLOBAL grad norm before any group transform, like torch
        # clip_grad_norm_ before optimizer.step()
        opt = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), opt)
    if cfg.grad_accum > 1:
        # Gradient MEAN over k micro-batches, params update every k-th step:
        # k micro-steps at lr == one k*B-batch step of the MEAN loss at lr
        # (the summed-CE loss of a true k*B batch would be k times larger).
        # BN running stats still update every micro-step.
        opt = optax.MultiSteps(opt, every_k_schedule=cfg.grad_accum)
    return opt


# optax >= 0.2.4 uses InjectStatefulHyperparamsState; keep both for compat.
_INJECT_STATES = tuple(
    getattr(optax, n) for n in
    ("InjectHyperparamsState", "InjectStatefulHyperparamsState")
    if hasattr(optax, n)) or tuple(
    getattr(optax.schedules, n, type(None)) for n in
    ("InjectStatefulHyperparamsState",))


def _is_inject(x) -> bool:
    return isinstance(x, _INJECT_STATES)


def _hyperparam_states(opt_state):
    """Yield every inject_hyperparams state inside a multi_transform state."""
    for s in jax.tree_util.tree_leaves(opt_state, is_leaf=_is_inject):
        if _is_inject(s):
            yield s


def current_learning_rate(opt_state) -> float:
    for s in _hyperparam_states(opt_state):
        return float(s.hyperparams["learning_rate"])
    raise ValueError("no inject_hyperparams state found")


def set_learning_rate(opt_state, lr: float):
    """Return a new opt_state with the base lr replaced in every group (group
    scale factors are baked into the update, so one base lr drives both)."""

    def update(s):
        if _is_inject(s):
            hp = dict(s.hyperparams)
            old = hp["learning_rate"]
            new = jnp.asarray(lr, jnp.float32)
            sharding = getattr(old, "sharding", None)
            if sharding is not None and getattr(sharding, "mesh", None) is not None:
                # keep the leaf's mesh placement: a default-device scalar
                # inside an otherwise replicated opt_state breaks donation
                # layouts and is unserializable in multi-controller runs
                new = jax.device_put(new, sharding)
            hp["learning_rate"] = new
            return s._replace(hyperparams=hp)
        return s

    return jax.tree_util.tree_map(update, opt_state, is_leaf=_is_inject)


@dataclasses.dataclass
class StepSchedule:
    """StepLR: lr = base * gamma^(epoch // step_size)
    (`train_singlenet_phase_1fc.py:490-495`)."""

    base_lr: float
    step_size: int
    gamma: float = 0.1

    def __call__(self, epoch: int, _val_metric: float = 0.0) -> float:
        return self.base_lr * (self.gamma ** (epoch // self.step_size))


@dataclasses.dataclass
class PlateauSchedule:
    """ReduceLROnPlateau on validation loss (`train_singlenet_phase_1fc.py:702-706`):
    scale lr by `factor` after `patience` epochs without improvement."""

    base_lr: float
    factor: float = 0.1
    patience: int = 2
    threshold: float = 1e-4
    best: float = float("inf")
    bad_epochs: int = 0
    scale: float = 1.0

    def __call__(self, epoch: int, val_metric: float) -> float:
        if val_metric < self.best * (1.0 - self.threshold):
            self.best = val_metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.scale *= self.factor
                self.bad_epochs = 0
        return self.base_lr * self.scale


def make_schedule(cfg: TrainConfig):
    if cfg.schedule == "step":
        return StepSchedule(cfg.lr, cfg.step_size, cfg.gamma)
    if cfg.schedule == "plateau":
        return PlateauSchedule(cfg.lr, cfg.plateau_factor, cfg.plateau_patience)
    if cfg.schedule == "constant":
        return lambda epoch, val: cfg.lr
    raise ValueError(f"unknown schedule {cfg.schedule!r}")
