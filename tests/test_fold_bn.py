"""BN-folding tests: folded ResNet matches eval-mode BN ResNet numerically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.models.fold_bn import fold_resnet, fold_variables
from tmrnet_tpu.models.resnet import ResNet


def _nontrivial_stats(variables, seed=0):
    """Randomize BN running stats so folding errors can't hide behind zeros."""
    rng = np.random.RandomState(seed)

    def walk(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) or hasattr(v, "items"):
                out[k] = walk(dict(v))
            else:
                if k == "mean":
                    out[k] = jnp.asarray(
                        rng.randn(*v.shape).astype(np.float32) * 0.2)
                elif k == "var":
                    out[k] = jnp.asarray(
                        (0.5 + rng.rand(*v.shape)).astype(np.float32))
                else:
                    out[k] = v
        return out

    stats = walk(dict(variables["batch_stats"]))
    # also randomize BN scale/bias
    def walk_params(tree):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict) or hasattr(v, "items"):
                out[k] = walk_params(dict(v))
            elif k in ("scale", "bias"):
                out[k] = jnp.asarray(
                    (0.5 + rng.rand(*v.shape)).astype(np.float32))
            else:
                out[k] = v
        return out

    return {"params": walk_params(dict(variables["params"])),
            "batch_stats": stats}


def test_folded_resnet_matches_bn_eval():
    model = ResNet(stage_sizes=(1, 1), width=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    variables = _nontrivial_stats(model.init(jax.random.PRNGKey(1), x))
    want = model.apply(variables, x, train=False)

    folded_params = fold_resnet(variables["params"], variables["batch_stats"])
    folded_model = ResNet(stage_sizes=(1, 1), width=8, folded=True)
    got = folded_model.apply({"params": folded_params}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_folded_resnest_matches_bn_eval():
    """fold_resnest covers the deep stem, SplAt conv (bn0) and fc1 Dense
    (bn1), conv1/conv3, and the avg_down shortcut."""
    from tmrnet_tpu.models.resnest import ResNeSt

    model = ResNeSt(stage_sizes=(1, 1), width=8, stem_width=8)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 64, 3))
    variables = _nontrivial_stats(model.init(jax.random.PRNGKey(3), x),
                                  seed=4)
    want = model.apply(variables, x, train=False)

    from tmrnet_tpu.models.fold_bn import fold_resnest

    folded_params = fold_resnest(variables["params"],
                                 variables["batch_stats"])
    folded_model = ResNeSt(stage_sizes=(1, 1), width=8, stem_width=8,
                           folded=True)
    got = folded_model.apply({"params": folded_params}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
    # fold_variables dispatches to the ResNeSt folder by tree shape
    fv = fold_variables({"params": {"backbone": variables["params"]},
                         "batch_stats": {"backbone":
                                         variables["batch_stats"]}})
    got2 = folded_model.apply({"params": fv["params"]["backbone"]}, x,
                              train=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_fold_variables_full_model():
    from tmrnet_tpu.config import ModelConfig
    from tmrnet_tpu.models.tmrnet import build_model

    cfg = ModelConfig(backbone="tiny", stage_sizes=(1, 1), width=8,
                      hidden_dim=16, num_classes=4, head="lfb",
                      compute_dtype="float32")
    model = build_model(cfg)
    clips = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32, 3))
    variables = _nontrivial_stats(model.init(jax.random.PRNGKey(1), clips))
    want = model.apply(variables, clips, train=False)

    folded = fold_variables(variables)
    assert "batch_stats" not in folded
    import dataclasses

    from tmrnet_tpu.models.resnet import ResNet as RN
    from tmrnet_tpu.models.tmrnet import LFBExtractor

    folded_model = LFBExtractor(
        RN(stage_sizes=(1, 1), width=8, folded=True), 16)
    got = folded_model.apply(folded, clips, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)
