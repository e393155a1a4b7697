"""CheckpointManager unit tests: gc, metadata, best pointer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.config import ModelConfig, TrainConfig
from tmrnet_tpu.models.tmrnet import build_model
from tmrnet_tpu.train.optim import make_optimizer
from tmrnet_tpu.train.state import create_train_state
from tmrnet_tpu.utils.checkpoint import BestTracker, CheckpointManager


def _state():
    cfg = ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                      hidden_dim=8, num_classes=3, head="stage1",
                      compute_dtype="float32")
    model = build_model(cfg)
    v = model.init(jax.random.PRNGKey(0), jnp.ones((1, 2, 16, 16, 3)))
    tx = make_optimizer(TrainConfig(), v["params"])
    return create_train_state(model, v, tx)


def test_gc_keeps_last_n_and_best(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=2)
    state = _state()
    for step, acc in [(1, 0.5), (2, 0.9), (3, 0.7), (4, 0.8)]:
        mgr.save(state.replace(step=jnp.asarray(step)), step=step,
                 metrics={"val_acc": acc}, is_best=(acc == 0.9))
    assert mgr.all_steps() == [3, 4]  # gc'd to keep=2
    assert mgr.latest_step() == 4
    # best survives gc independently
    best = mgr.restore_best(state)
    assert int(best.step) == 2
    assert mgr.metadata(4)["metrics"]["val_acc"] == 0.8


def test_restore_roundtrip_values(tmp_path):
    mgr = CheckpointManager(str(tmp_path), keep=3)
    state = _state()
    state = state.replace(step=jnp.asarray(7))
    mgr.save(state, step=7, metrics={})
    fresh = _state()
    restored = mgr.restore(fresh)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y))


def test_restore_missing_raises(tmp_path):
    mgr = CheckpointManager(str(tmp_path))
    with pytest.raises(FileNotFoundError):
        mgr.restore(_state())
    with pytest.raises(FileNotFoundError):
        mgr.restore_best(_state())


def test_best_tracker_tiebreak():
    t = BestTracker()
    assert t.update(0, 0.8, 0.7)
    assert not t.update(1, 0.7, 0.9)    # lower val
    assert t.update(2, 0.8, 0.8)        # same val, better train
    assert t.best_epoch == 2
