"""Whole-model TRAIN-STEP parity vs the torch oracle.

Forward-logits parity (test_e2e_logits_parity.py) and optimizer-level parity
(test_train.py, synthetic grads) leave one seam untested: the backward pass
through the full TMRNet — trunk convs + BN (train mode, batch stats),
lax.scan LSTM, TimeConv branch max, NLBlock attention, classifier — and the
BN running-stat update, driven through the REAL jitted train_step. This
module closes it: one SGD step with identical weights/batch on both sides
must produce the same loss, the same parameter deltas (= lr * gradient, so
this IS gradient parity for every parameter), and the same BN stats.

Reference semantics under test: last-frame weighted sum-CE
(`code/Training TMRNet/train_non-local_mutiConv_resnet.py:880-887`), BN
momentum 0.1 (torch default), single-layer batch_first LSTM
(`train_singlenet_phase_1fc.py:214`).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.config import ModelConfig, TrainConfig
from tmrnet_tpu.models.tmrnet import build_model
from tmrnet_tpu.models.torch_import import (
    convert_reference_checkpoint,
    merge_variables,
)
from tmrnet_tpu.train.optim import make_optimizer
from tmrnet_tpu.train.state import create_train_state
from tmrnet_tpu.train.steps import make_stage2_steps

from tests.test_e2e_logits_parity import SEQ, HW, HID, NCLS, WIN, TorchTMRNet
from tests.test_torch_import import _randomize_bn_stats

torch = pytest.importorskip("torch")
nn = torch.nn

LR = 0.05


def _tree_of(sd):
    """state_dict snapshot -> converted flax variable tree."""
    return convert_reference_checkpoint(
        {k: np.array(v.detach().numpy()) for k, v in sd.items()},
        head="tmr", stage_sizes=(1, 1))


def test_tmrnet_train_step_matches_torch_sgd_step():
    torch.manual_seed(0)
    tm = TorchTMRNet().train()  # BN normalizes with batch stats, updates EMA
    _randomize_bn_stats(tm, np.random.RandomState(7))

    rng = np.random.RandomState(3)
    clips = rng.randn(3, SEQ, 3, HW, HW).astype(np.float32)
    lt = rng.randn(3, WIN, HID).astype(np.float32)
    labels = rng.randint(0, NCLS, size=3)
    w = (rng.rand(NCLS) + 0.5).astype(np.float32)

    # snapshot BEFORE the forward: train-mode BN mutates running stats
    before = _tree_of(tm.state_dict())

    crit = nn.CrossEntropyLoss(weight=torch.from_numpy(w), reduction="sum")
    opt = torch.optim.SGD(tm.parameters(), lr=LR)
    out = tm(torch.from_numpy(clips), torch.from_numpy(lt))
    tloss = crit(out, torch.from_numpy(labels))
    opt.zero_grad()
    tloss.backward()
    opt.step()
    after = _tree_of(tm.state_dict())

    # the framework side drives the REAL jitted stage-2 train_step; dropout
    # rates 0 so both sides are deterministic (the oracle has no dropout)
    cfg = ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                      hidden_dim=HID, num_classes=NCLS, head="tmr",
                      compute_dtype="float32",
                      dropout_head=0.0, dropout_nl=0.0)
    model = build_model(cfg)
    jclips = jnp.asarray(clips.transpose(0, 1, 3, 4, 2))  # NCHW -> NHWC
    init = model.init(jax.random.PRNGKey(0), jclips, jnp.asarray(lt))
    variables = {c: merge_variables(init[c], before.get(c, {})) for c in init}
    tcfg = TrainConfig(optimizer="sgd", lr=LR, momentum=0.0, weight_decay=0.0,
                       dampening=0.0, nesterov=False, trunk_lr_scale=1.0)
    tx = make_optimizer(tcfg, variables["params"])
    state = create_train_state(model, variables, tx)
    train_step, _ = make_stage2_steps(class_weights=w, loss_reduction="sum",
                                      donate=False)
    state2, metrics = train_step(state, jclips, jnp.asarray(lt),
                                 jnp.asarray(labels), jax.random.PRNGKey(1))

    assert float(metrics["loss"]) == pytest.approx(tloss.item(), rel=1e-4)
    assert int(metrics["count"]) == 3

    # parameter-delta parity == gradient parity (delta = -lr * grad); compare
    # deltas rather than raw params so identical-weight no-ops can't hide a
    # broken backward, and assert the step actually moved the weights
    flat0 = jax.tree_util.tree_leaves_with_path(before["params"])
    got1 = state2.params
    moved = 0.0
    for path, w0 in flat0:
        w0 = np.asarray(w0)
        want1 = np.asarray(_get(after["params"], path))
        got = np.asarray(_get(got1, path))
        name = jax.tree_util.keystr(path)
        np.testing.assert_allclose(
            got - w0, want1 - w0, rtol=2e-3, atol=2e-5,
            err_msg=f"param delta mismatch at {name}")
        moved = max(moved, float(np.abs(want1 - w0).max()))
    assert moved > 1e-6  # the oracle step was not a no-op

    # BN running stats: identical EMA semantics (flax momentum 0.9 == torch
    # 0.1); torch uses the UNBIASED batch var for the EMA while flax uses the
    # biased one — at n >= 12*32*32 pixels/channel that's < 1e-4 relative,
    # inside this tolerance
    for path, s0 in jax.tree_util.tree_leaves_with_path(after["batch_stats"]):
        got = np.asarray(_get(state2.batch_stats, path))
        np.testing.assert_allclose(
            got, np.asarray(s0), rtol=2e-3, atol=1e-5,
            err_msg=f"batch_stats mismatch at {jax.tree_util.keystr(path)}")


def _get(tree, path):
    for p in path:
        tree = tree[p.key]
    return tree
