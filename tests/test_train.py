"""Training-layer tests: loss semantics vs torch, optimizer groups vs torch SGD,
schedules, and end-to-end tiny train steps that actually reduce the loss."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from tmrnet_tpu.config import ModelConfig, TrainConfig
from tmrnet_tpu.models.tmrnet import build_model
from tmrnet_tpu.train.losses import balanced_class_weights, weighted_cross_entropy
from tmrnet_tpu.train.optim import (
    PlateauSchedule,
    StepSchedule,
    current_learning_rate,
    make_optimizer,
    make_schedule,
    set_learning_rate,
)
from tmrnet_tpu.train.state import create_train_state
from tmrnet_tpu.train.steps import make_stage1_steps, make_stage2_steps

torch = pytest.importorskip("torch")


def test_balanced_class_weights_match_sklearn():
    from sklearn.utils.class_weight import compute_class_weight

    labels = np.array([0, 0, 0, 1, 1, 2, 2, 2, 2, 5])
    got = balanced_class_weights(labels, 7)
    present = np.unique(labels)
    want = compute_class_weight("balanced", classes=present, y=labels)
    np.testing.assert_allclose(got[present], want, rtol=1e-6)
    assert got[3] == 0.0 and got[6] == 0.0  # absent classes


def test_weighted_ce_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(9, 7).astype(np.float32)
    labels = rng.randint(0, 7, size=9)
    w = rng.rand(7).astype(np.float32) + 0.1

    tl = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w), reduction="sum")
    want = tl(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                 jnp.asarray(w), "sum")
    assert float(got) == pytest.approx(want, rel=1e-5)

    tl_mean = torch.nn.CrossEntropyLoss(weight=torch.from_numpy(w))
    want_mean = tl_mean(torch.from_numpy(logits), torch.from_numpy(labels)).item()
    got_mean = weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                      jnp.asarray(w), "mean")
    assert float(got_mean) == pytest.approx(want_mean, rel=1e-5)


def test_sgd_matches_torch_two_steps():
    # single fast-group param; torch SGD(momentum, weight_decay) oracle
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], dtype=np.float32)
    g1 = np.array([[0.1, 0.2], [-0.3, 0.4]], dtype=np.float32)
    g2 = np.array([[0.05, -0.1], [0.2, 0.1]], dtype=np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, weight_decay=0.01)
    for g in (g1, g2):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    cfg = TrainConfig(optimizer="sgd", lr=0.1, momentum=0.9, weight_decay=0.01)
    params = {"head": {"w": jnp.asarray(w0)}}
    tx = make_optimizer(cfg, params, slow_modules=("backbone",))
    state = tx.init(params)
    p = params
    for g in (g1, g2):
        updates, state = tx.update({"head": {"w": jnp.asarray(g)}}, state, p)
        p = optax.apply_updates(p, updates)
    np.testing.assert_allclose(np.asarray(p["head"]["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_optimizer_group_scaling():
    cfg = TrainConfig(optimizer="sgd", lr=1.0, momentum=0.0, weight_decay=0.0,
                      trunk_lr_scale=0.1)
    params = {"backbone": {"w": jnp.ones((2,))}, "fc": {"w": jnp.ones((2,))}}
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = {"backbone": {"w": jnp.ones((2,))}, "fc": {"w": jnp.ones((2,))}}
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["w"]), -0.1)
    np.testing.assert_allclose(np.asarray(updates["fc"]["w"]), -1.0)


def test_grad_clip_torch_semantics():
    """train.grad_clip clips the GLOBAL grad norm before the optimizer
    (torch clip_grad_norm_ before step()); lr injection still works through
    the extra chain wrapper."""
    cfg = TrainConfig(optimizer="sgd", lr=1.0, momentum=0.0,
                      weight_decay=0.0, trunk_lr_scale=0.1, grad_clip=1.0)
    params = {"backbone": {"w": jnp.ones((2,))}, "fc": {"w": jnp.ones((2,))}}
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    grads = {"backbone": {"w": jnp.full((2,), 3.0)},
             "fc": {"w": jnp.full((2,), 4.0)}}
    updates, state = tx.update(grads, state, params)
    # global norm = sqrt(2*9 + 2*16) = sqrt(50); each grad scales by
    # 1/sqrt(50), then the group lrs apply (backbone at lr*0.1)
    import math

    scale = 1.0 / math.sqrt(50.0)
    np.testing.assert_allclose(np.asarray(updates["backbone"]["w"]),
                               -0.1 * 3.0 * scale, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(updates["fc"]["w"]),
                               -4.0 * scale, rtol=1e-6)
    # below the threshold nothing changes
    small = {"backbone": {"w": jnp.full((2,), 0.1)},
             "fc": {"w": jnp.full((2,), 0.1)}}
    updates, state = tx.update(small, state, params)
    np.testing.assert_allclose(np.asarray(updates["fc"]["w"]), -0.1,
                               rtol=1e-6)
    # lr re-injection reaches through the clip wrapper
    state = set_learning_rate(state, 0.5)
    assert current_learning_rate(state) == pytest.approx(0.5)
    updates, _ = tx.update(small, state, params)
    np.testing.assert_allclose(np.asarray(updates["fc"]["w"]), -0.05,
                               rtol=1e-6)


def test_set_learning_rate_no_recompile():
    cfg = TrainConfig(optimizer="sgd", lr=0.5, momentum=0.0, weight_decay=0.0)
    params = {"fc": {"w": jnp.ones((2,))}}
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    assert current_learning_rate(state) == pytest.approx(0.5)
    state = set_learning_rate(state, 0.05)
    assert current_learning_rate(state) == pytest.approx(0.05)
    updates, _ = tx.update({"fc": {"w": jnp.ones((2,))}}, state, params)
    np.testing.assert_allclose(np.asarray(updates["fc"]["w"]), -0.05)


def test_schedules():
    s = StepSchedule(base_lr=1.0, step_size=3, gamma=0.1)
    assert [s(e) for e in range(7)] == [1.0, 1.0, 1.0, 0.1, 0.1, 0.1,
                                        pytest.approx(0.01)]
    p = PlateauSchedule(base_lr=1.0, factor=0.5, patience=1)
    lrs = [p(e, v) for e, v in enumerate([1.0, 0.9, 0.95, 0.96, 0.97])]
    # improves, improves, bad(1), bad(2)->decay, bad(1)
    assert lrs == [1.0, 1.0, 1.0, 0.5, 0.5]
    assert callable(make_schedule(TrainConfig(schedule="constant")))


def _tiny_cfg(head):
    return ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                       hidden_dim=32, num_classes=4, head=head,
                       compute_dtype="float32")


def test_grad_accum_matches_mean_batch_step():
    """grad_accum=k (optax.MultiSteps): params move only on the k-th micro
    step, by exactly one step on the MEAN of the k micro gradients; the lr
    get/set helpers must still reach the inject states through the wrapper."""
    import dataclasses

    from tmrnet_tpu.train.optim import (
        current_learning_rate,
        make_optimizer,
        set_learning_rate,
    )

    base = TrainConfig(optimizer="sgd", momentum=0.0, weight_decay=0.0,
                       lr=0.1, schedule="constant")
    params0 = {"backbone": jnp.asarray([1.0, 2.0, 3.0]),
               "head": jnp.asarray([1.0, -1.0, 0.5])}
    g1 = {"backbone": jnp.asarray([0.5, -0.2, 1.0]),
          "head": jnp.asarray([1.0, 1.0, 1.0])}
    g2 = {"backbone": jnp.asarray([-0.1, 0.4, 0.0]),
          "head": jnp.asarray([0.0, -2.0, 3.0])}

    cfg = dataclasses.replace(base, grad_accum=2)
    opt = make_optimizer(cfg, params0, slow_modules=("backbone",))
    st = opt.init(params0)
    assert current_learning_rate(st) == pytest.approx(0.1)
    st = set_learning_rate(st, 0.05)
    assert current_learning_rate(st) == pytest.approx(0.05)
    st = set_learning_rate(st, 0.1)

    u1, st = opt.update(g1, st, params0)
    p1 = optax.apply_updates(params0, u1)
    for k in params0:  # micro step 1: no movement
        np.testing.assert_allclose(np.asarray(p1[k]), np.asarray(params0[k]))
    u2, st = opt.update(g2, st, p1)
    p2 = optax.apply_updates(p1, u2)

    ref_opt = make_optimizer(base, params0, slow_modules=("backbone",))
    ref_st = ref_opt.init(params0)
    gm = jax.tree_util.tree_map(lambda a, b: (a + b) / 2.0, g1, g2)
    ru, _ = ref_opt.update(gm, ref_st, params0)
    want = optax.apply_updates(params0, ru)
    for k in params0:
        np.testing.assert_allclose(np.asarray(p2[k]), np.asarray(want[k]),
                                   atol=1e-7)


def test_grad_accum_state_shards_structurally():
    """shard_state must place the MultiSteps acc_grads like their params
    (suffix matching reaches through the wrapper state)."""
    import dataclasses

    from tmrnet_tpu.config import MeshConfig
    from tmrnet_tpu.parallel.mesh import make_mesh, shard_state
    from tmrnet_tpu.train.optim import make_optimizer
    from tmrnet_tpu.train.state import TrainState

    cfg = TrainConfig(optimizer="sgd", lr=0.1, grad_accum=4,
                      schedule="constant")
    # a param shaped to match a TP rule (nl_block query kernel, 16x16)
    params = {"nl_block": {"query": {"kernel": jnp.ones((16, 16))}},
              "fc": {"kernel": jnp.ones((16, 4))}}
    opt = make_optimizer(cfg, params, slow_modules=())
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       batch_stats={}, opt_state=opt.init(params),
                       apply_fn=lambda *a, **k: None, tx=opt)
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    sharded = shard_state(mesh, state)
    accs = sharded.opt_state.acc_grads
    q = accs["nl_block"]["query"]["kernel"]
    assert q.sharding == sharded.params["nl_block"]["query"]["kernel"].sharding
    spec = q.sharding.spec
    assert tuple(spec) == (None, "model")


def test_stage1_train_step_reduces_loss():
    cfg = _tiny_cfg("stage1")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (8, 3, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3, 0, 1, 2, 3])
    variables = model.init(rng, clips)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=0.05), variables["params"])
    state = create_train_state(model, variables, tx)
    train_step, eval_step = make_stage1_steps()

    first = None
    for i in range(12):
        state, m = train_step(state, clips, labels, jax.random.PRNGKey(i))
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    em = eval_step(state, clips, labels)
    assert em["preds"].shape == (8,)
    assert em["probs"].shape == (8, 4)
    assert int(em["count"]) == 8


def test_stage2_train_step_runs_and_learns():
    cfg = _tiny_cfg("tmr")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (6, 3, 16, 16, 3))
    memory = jax.random.normal(jax.random.PRNGKey(1), (6, 5, 32))
    labels = jnp.array([0, 1, 2, 3, 0, 1])
    variables = model.init(rng, clips, memory)
    tx = make_optimizer(
        TrainConfig(optimizer="sgd", lr=0.003), variables["params"],
        slow_modules=("backbone", "encoder"))
    state = create_train_state(model, variables, tx)
    train_step, eval_step = make_stage2_steps()

    # compare deterministic eval loss before/after (train loss is noisy under
    # the head's 0.5 dropout)
    before = float(eval_step(state, clips, memory, labels)["loss"])
    for i in range(15):
        state, m = train_step(state, clips, memory, labels, jax.random.PRNGKey(i))
    em = eval_step(state, clips, memory, labels)
    assert float(em["loss"]) < before
    assert em["preds"].shape == (6,)


def test_adam_matches_torch_two_steps():
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], dtype=np.float32)
    g1 = np.array([[0.1, 0.2], [-0.3, 0.4]], dtype=np.float32)
    g2 = np.array([[0.05, -0.1], [0.2, 0.1]], dtype=np.float32)

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=0.01)
    for g in (g1, g2):
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    cfg = TrainConfig(optimizer="adam", lr=0.01, weight_decay=0.0)
    params = {"head": {"w": jnp.asarray(w0)}}
    tx = make_optimizer(cfg, params)
    state = tx.init(params)
    p = params
    for g in (g1, g2):
        updates, state = tx.update({"head": {"w": jnp.asarray(g)}}, state, p)
        p = optax.apply_updates(p, updates)
    np.testing.assert_allclose(np.asarray(p["head"]["w"]),
                               tw.detach().numpy(), rtol=1e-4, atol=1e-6)


def test_padded_labels_masked_in_loss_and_metrics():
    """Batch padding (label -1) contributes zero loss and is excluded from
    correct/count — the train epoch accounting depends on this. (BN train-mode
    batch stats still see padded rows: unavoidable with static shapes.)"""
    cfg = _tiny_cfg("stage1")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (4, 3, 16, 16, 3))
    variables = model.init(rng, clips)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=0.05),
                        variables["params"])
    train_step, eval_step = make_stage1_steps(class_weights=np.ones(4))

    labels_full = jnp.array([0, 1, 2, 3])
    labels_pad = jnp.array([0, 1, -1, -1])  # last two rows are padding

    # train_step donates its state, so give it a copy of the variables
    state = create_train_state(
        model, jax.tree_util.tree_map(jnp.copy, variables), tx)
    _, m_pad = train_step(state, clips, labels_pad, jax.random.PRNGKey(7))
    assert int(m_pad["count"]) == 2
    assert int(m_pad["correct"]) <= 2

    # loss of the padded batch == loss of just the first two rows
    em = eval_step(create_train_state(model, variables, tx), clips, labels_pad)
    em2 = eval_step(create_train_state(model, variables, tx), clips[:2],
                    labels_full[:2])
    np.testing.assert_allclose(float(em["loss"]), float(em2["loss"]),
                               rtol=1e-5)
    # per-sample losses are exactly zero at padded rows
    assert np.asarray(em["losses"])[2:].sum() == 0.0


def test_clip_loader_pads_with_negative_labels():
    from tests.test_data_pipeline import _toy_setup  # type: ignore
    from tmrnet_tpu.data.pipeline import ClipLoader

    ds, _ = _toy_setup()  # 34 clips
    loader = ClipLoader(ds, batch_clips=8, shuffle=False, num_workers=1)
    clips, labels, rows, pad = list(loader.epoch(0))[-1]
    assert pad == 6
    assert (labels[-pad:] == -1).all()
    assert (labels[:-pad] >= 0).all()


def test_sgd_dampening_matches_torch():
    """--dampening parity: torch's first momentum step is UNDAMPENED
    (buf_0 = g), later steps buf = m*buf + (1-d)*g; three steps pin both."""
    w0 = np.array([[1.0, -2.0], [0.5, 3.0]], dtype=np.float32)
    grads = [np.array([[0.1, 0.2], [-0.3, 0.4]], np.float32),
             np.array([[0.05, -0.1], [0.2, 0.1]], np.float32),
             np.array([[-0.2, 0.3], [0.1, -0.4]], np.float32)]

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([tw], lr=0.1, momentum=0.9, dampening=0.3,
                          weight_decay=0.01)
    for g in grads:
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()

    cfg = TrainConfig(optimizer="sgd", lr=0.1, momentum=0.9, dampening=0.3,
                      weight_decay=0.01)
    params = {"head": {"w": jnp.asarray(w0)}}
    tx = make_optimizer(cfg, params, slow_modules=("backbone",))
    state = tx.init(params)
    p = params
    for g in grads:
        updates, state = tx.update({"head": {"w": jnp.asarray(g)}}, state, p)
        p = optax.apply_updates(p, updates)
    np.testing.assert_allclose(np.asarray(p["head"]["w"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-7)

    with pytest.raises(ValueError):  # torch parity: nesterov forbids dampening
        make_optimizer(TrainConfig(optimizer="sgd", momentum=0.9,
                                   dampening=0.3, nesterov=True),
                       params, slow_modules=())


def test_label_smoothing_wired_into_steps():
    """train.label_smoothing must reach the loss (it was a dead knob):
    smoothed CE on one-hot-confident logits is strictly larger, and the
    torch oracle pins the exact value."""
    cfg = _tiny_cfg("stage1")
    model = build_model(cfg)
    rng = jax.random.PRNGKey(0)
    clips = jax.random.normal(rng, (4, 3, 16, 16, 3))
    labels = jnp.array([0, 1, 2, 3])
    variables = model.init(rng, clips)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=0.0),
                        variables["params"])
    state = create_train_state(model, variables, tx)

    _, ev0 = make_stage1_steps(label_smoothing=0.0)
    _, ev1 = make_stage1_steps(label_smoothing=0.2)
    m0, m1 = ev0(state, clips, labels), ev1(state, clips, labels)
    assert float(m1["loss"]) != float(m0["loss"])

    out = state.apply_fn(state.variables, clips, train=False)
    logits = np.asarray(out[:, -1, :], np.float32)
    tl = torch.nn.CrossEntropyLoss(reduction="sum", label_smoothing=0.2)
    want = tl(torch.from_numpy(logits),
              torch.from_numpy(np.asarray(labels, np.int64))).item()
    np.testing.assert_allclose(float(m1["loss"]), want, rtol=1e-5)


def test_train_transform_normalize_false_is_exact_uint8_wire():
    """normalize=False must return the exact uint8 clip the normalizing
    stack would have normalized — every preceding op is uint8->uint8, so
    host-normalize(raw) == the normalized output bit for bit."""
    from tmrnet_tpu.data.transforms import TrainTransform, normalize

    rng = np.random.RandomState(0)
    clip = rng.randint(0, 255, (4, 250, 250, 3), np.uint8)
    for use_flip in (False, True):
        tf_f = TrainTransform(224, 250, use_flip)
        tf_u8 = TrainTransform(224, 250, use_flip, normalize=False)
        raw = tf_u8(clip, epoch=1, clip_id=5)
        assert raw.dtype == np.uint8 and raw.shape == (4, 224, 224, 3)
        want = tf_f(clip, epoch=1, clip_id=5)
        np.testing.assert_array_equal(normalize(raw, tf_f.mean, tf_f.std),
                                      want)


def test_train_step_prep_matches_host_normalize():
    """A train step fed raw uint8 through DevicePrep must match the same
    step fed host-normalized floats: same loss/metrics and same updated
    params (within f32 rounding of the algebraically-equal normalize)."""
    import dataclasses as dc

    from tmrnet_tpu.config import DataConfig
    from tmrnet_tpu.data.device_feed import DevicePrep
    from tmrnet_tpu.data.transforms import normalize
    from tmrnet_tpu.models.tmrnet import build_model

    mcfg = _tiny_cfg("stage1")
    dcfg = DataConfig(device_normalize=True)
    model = build_model(mcfg)
    rng = np.random.RandomState(1)
    u8 = rng.randint(0, 255, (4, 3, 24, 24, 3), np.uint8)
    host = normalize(u8, dcfg.mean, dcfg.std)
    labels = jnp.asarray(rng.randint(0, mcfg.num_classes, 4))

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(host))
    tcfg = TrainConfig(optimizer="sgd", lr=0.05, momentum=0.9)
    tx = make_optimizer(tcfg, variables["params"], ("backbone",))

    def one_step(step_fn, clips):
        state = create_train_state(model, variables, tx)
        return step_fn(state, jnp.asarray(clips), labels,
                       jax.random.PRNGKey(2))

    prep = DevicePrep(dcfg, jnp.float32)
    step_prep, _ = make_stage1_steps(donate=False, prep=prep)
    step_host, _ = make_stage1_steps(donate=False)
    s1, m1 = one_step(step_prep, u8)
    s2, m2 = one_step(step_host, host)
    assert int(m1["correct"]) == int(m2["correct"])
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-5)
    for p1, p2 in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=1e-4, atol=1e-6)
