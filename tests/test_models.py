"""Model-block tests: torch-oracle parity for LSTM/TimeConv, numpy-oracle for
NLBlock math, shape/behavior tests for backbones and heads."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.config import ModelConfig
from tmrnet_tpu.models.blocks import NLBlock, TimeConv
from tmrnet_tpu.models.lstm import LSTM
from tmrnet_tpu.models.resnet import ResNet, tiny_resnet
from tmrnet_tpu.models.resnest import ResNeSt, SplitAttention
from tmrnet_tpu.models.tmrnet import (
    LFBExtractor,
    MemoryBankModel,
    TMRNet,
    build_model,
)

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# LSTM vs torch.nn.LSTM
# ---------------------------------------------------------------------------


def test_lstm_matches_torch():
    b, t, d, h = 3, 10, 16, 8
    rng = np.random.RandomState(0)
    x = rng.randn(b, t, d).astype(np.float32)

    tl = torch.nn.LSTM(d, h, batch_first=True)
    with torch.no_grad():
        want, (hT, cT) = tl(torch.from_numpy(x))

    model = LSTM(hidden_dim=h)
    params = {
        "params": {
            "weight_ih": jnp.asarray(tl.weight_ih_l0.detach().numpy()),
            "weight_hh": jnp.asarray(tl.weight_hh_l0.detach().numpy()),
            "bias_ih": jnp.asarray(tl.bias_ih_l0.detach().numpy()),
            "bias_hh": jnp.asarray(tl.bias_hh_l0.detach().numpy()),
        }
    }
    got, (gh, gc) = model.apply(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gh), hT[0].numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc), cT[0].numpy(), atol=1e-5)


def test_lstm_initial_state_threading():
    model = LSTM(hidden_dim=4)
    x = jnp.ones((2, 3, 5))
    params = model.init(jax.random.PRNGKey(0), x)
    ys, (h, c) = model.apply(params, x)
    # continuing from (h, c) over a second chunk == running the full sequence
    x2 = jnp.ones((2, 2, 5)) * 0.5
    ys2, _ = model.apply(params, x2, (h, c))
    full, _ = model.apply(params, jnp.concatenate([x, x2], axis=1))
    np.testing.assert_allclose(np.asarray(full[:, 3:]), np.asarray(ys2), atol=1e-6)


# ---------------------------------------------------------------------------
# TimeConv vs torch oracle built from the published equations
# ---------------------------------------------------------------------------


def test_timeconv_matches_torch_oracle():
    b, w, f = 2, 30, 32
    rng = np.random.RandomState(1)
    x = rng.randn(b, w, f).astype(np.float32)

    model = TimeConv(feature_dim=f)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(model.apply(params, jnp.asarray(x)))

    # torch oracle: three same-pad conv1d + causal 2-maxpool + identity, branch max
    p = params["params"]
    xt = torch.from_numpy(x).transpose(1, 2)  # (B, F, W)
    branches = [xt]
    for k, name in [(3, "conv_k3"), (5, "conv_k5"), (7, "conv_k7")]:
        conv = torch.nn.Conv1d(f, f, k, padding=k // 2)
        with torch.no_grad():
            # flax kernel (k, in, out) -> torch (out, in, k)
            conv.weight.copy_(torch.from_numpy(
                np.transpose(np.asarray(p[name]["kernel"]), (2, 1, 0)).copy()))
            conv.bias.copy_(torch.from_numpy(np.asarray(p[name]["bias"]).copy()))
            branches.append(conv(xt))
    padded = torch.nn.functional.pad(xt, (1, 0))
    branches.append(torch.nn.MaxPool1d(2, stride=1)(padded))
    want = branches[0]
    for br in branches[1:]:
        want = torch.maximum(want, br)
    want = want.transpose(1, 2).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_timeconv_window_agnostic():
    # Unlike the reference (hard-coded 30), any window length works.
    model = TimeConv(feature_dim=16)
    x40 = jnp.ones((2, 40, 16))
    params = model.init(jax.random.PRNGKey(0), x40)
    assert model.apply(params, x40).shape == (2, 40, 16)
    assert model.apply(params, jnp.ones((2, 7, 16))).shape == (2, 7, 16)


# ---------------------------------------------------------------------------
# NLBlock vs numpy oracle of the reference equations
# ---------------------------------------------------------------------------


def test_nlblock_matches_numpy_oracle():
    b, w, f = 4, 30, 64
    rng = np.random.RandomState(2)
    st = rng.randn(b, f).astype(np.float32)
    lt = rng.randn(b, w, f).astype(np.float32)

    model = NLBlock(feature_dim=f)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(st), jnp.asarray(lt))
    got = np.asarray(model.apply(params, jnp.asarray(st), jnp.asarray(lt),
                                 deterministic=True))

    p = params["params"]
    lin = lambda name, v: v @ np.asarray(p[name]["kernel"]) + np.asarray(p[name]["bias"])
    q = lin("query", st)[:, None, :]                     # (B,1,F)
    k = lin("key", lt)                                   # (B,W,F)
    v = lin("value", lt)
    logits = np.einsum("bqf,bwf->bqw", q, k) * (1.0 / f) ** 0.5
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    attn = e / e.sum(axis=-1, keepdims=True)
    sll = np.einsum("bqw,bwf->bqf", attn, v)
    mu = sll.mean(axis=-1, keepdims=True)
    var = sll.var(axis=-1, keepdims=True)
    ln = (sll - mu) / np.sqrt(var + 1e-6)
    ln = ln * np.asarray(p["layer_norm"]["scale"]) + np.asarray(p["layer_norm"]["bias"])
    out = lin("out", np.maximum(ln, 0.0))
    want = st + out[:, 0, :]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_nlblock_residual_dominates_zero_memory():
    # With zero params in the out projection the block is the identity on St.
    f = 32
    model = NLBlock(feature_dim=f)
    st = jnp.ones((2, f))
    lt = jnp.zeros((2, 10, f))
    params = model.init(jax.random.PRNGKey(0), st, lt)
    params = jax.tree_util.tree_map(jnp.zeros_like, params)
    out = model.apply(params, st, lt, deterministic=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(st), atol=1e-6)


# ---------------------------------------------------------------------------
# Backbones
# ---------------------------------------------------------------------------


def test_tiny_resnet_shapes_and_bn_modes():
    model = tiny_resnet()
    x = jnp.ones((2, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    assert "batch_stats" in variables
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, model.num_features)
    # train mode mutates batch_stats
    out2, updates = model.apply(variables, x, train=True, mutable=["batch_stats"])
    assert out2.shape == (2, model.num_features)
    assert jax.tree_util.tree_reduce(
        lambda a, l: a + l.size, updates["batch_stats"], 0) > 0


def test_resnet50_feature_dim():
    model = ResNet()
    assert model.num_features == 2048


def test_resnest_split_attention_rsoftmax():
    # radix softmax: attention weights over radix sum to 1 per channel.
    m = SplitAttention(channels=16, radix=2)
    x = jnp.ones((2, 8, 8, 16))
    variables = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(variables, x)
    assert out.shape == (2, 8, 8, 16)


def test_resnest_tiny_forward():
    model = ResNeSt(stage_sizes=(1, 1), width=8, stem_width=8)
    x = jnp.ones((1, 64, 64, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(variables, x)
    assert out.shape == (1, model.num_features)


# ---------------------------------------------------------------------------
# Heads
# ---------------------------------------------------------------------------


def _tiny_cfg(head):
    return ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                       feature_dim=64, hidden_dim=32, num_classes=7,
                       head=head, compute_dtype="float32")


@pytest.mark.parametrize("head,extra", [
    ("stage1", None), ("lfb", None), ("tmr", 6), ("nl_only", 6)])
def test_heads_forward_shapes(head, extra):
    cfg = _tiny_cfg(head)
    model = build_model(cfg)
    clips = jnp.ones((2, 4, 32, 32, 3))
    args = (clips,) if extra is None else (clips, jnp.ones((2, extra, 32)))
    variables = model.init(jax.random.PRNGKey(0), *args)
    out = model.apply(variables, *args)
    if head == "stage1":
        assert out.shape == (2, 4, 7)
    elif head == "lfb":
        assert out.shape == (2, 32)
    else:
        assert out.shape == (2, 7)


def test_stage1_vs_lfb_share_encoder_params():
    # The LFB extractor loads stage-1 weights strict=False in the reference;
    # here the encoder subtree is directly shared by construction.
    cfg = _tiny_cfg("stage1")
    m1 = build_model(cfg)
    clips = jnp.ones((1, 4, 32, 32, 3))
    v1 = m1.init(jax.random.PRNGKey(0), clips)
    m2 = build_model(_tiny_cfg("lfb"))
    v2 = m2.init(jax.random.PRNGKey(0), clips)
    # the shared subtrees are 'backbone' and 'encoder' (the LSTM)
    assert set(v2["params"]["encoder"].keys()) == set(v1["params"]["encoder"].keys())
    assert set(v2["params"]["backbone"].keys()) == set(v1["params"]["backbone"].keys())
    # transplant stage-1 trunk+lstm params into the extractor and run
    v2 = {"params": {**v2["params"], "encoder": v1["params"]["encoder"],
                     "backbone": v1["params"]["backbone"]},
          "batch_stats": {"backbone": v1["batch_stats"]["backbone"]}}
    out = m2.apply(v2, clips)
    assert out.shape == (1, 32)


def test_tmr_dropout_train_vs_eval():
    cfg = _tiny_cfg("tmr")
    model = build_model(cfg)
    clips = jnp.ones((2, 4, 32, 32, 3))
    lt = jnp.ones((2, 6, 32))
    variables = model.init(jax.random.PRNGKey(0), clips, lt)
    e1 = model.apply(variables, clips, lt)
    e2 = model.apply(variables, clips, lt)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2))  # eval deterministic
    t1, _ = model.apply(variables, clips, lt, train=True,
                        rngs={"dropout": jax.random.PRNGKey(1)},
                        mutable=["batch_stats"])
    t2, _ = model.apply(variables, clips, lt, train=True,
                        rngs={"dropout": jax.random.PRNGKey(2)},
                        mutable=["batch_stats"])
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_remat_backbone_forward_and_grad():
    # remat'd bottlenecks must produce identical outputs and allow grads
    from tmrnet_tpu.models.resnet import ResNet

    x = jnp.ones((2, 32, 32, 3))
    plain = ResNet(stage_sizes=(1, 1), width=8, remat=False)
    v = plain.init(jax.random.PRNGKey(0), x)
    rematted = ResNet(stage_sizes=(1, 1), width=8, remat=True)
    out_a = plain.apply(v, x, train=False)
    out_b = rematted.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)

    def loss(params):
        out, _ = rematted.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, x,
            train=True, mutable=["batch_stats"])
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(v["params"])
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))
