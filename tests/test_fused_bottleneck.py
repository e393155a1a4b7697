"""Fused bottleneck kernel vs XLA oracle and vs the folded flax Bottleneck."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.experimental.fused_bottleneck import (
    fused_bottleneck,
    fused_bottleneck_reference,
)


def _weights(c, p, seed=0):
    rng = np.random.RandomState(seed)
    scale = 1.0 / np.sqrt(c)
    return (jnp.asarray(rng.randn(c, p).astype(np.float32) * scale),
            jnp.asarray(rng.randn(p).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(3, 3, p, p).astype(np.float32) * scale * 0.3),
            jnp.asarray(rng.randn(p).astype(np.float32) * 0.1),
            jnp.asarray(rng.randn(p, c).astype(np.float32) * scale),
            jnp.asarray(rng.randn(c).astype(np.float32) * 0.1))


def test_fused_bottleneck_matches_oracle():
    c, p = 64, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, c))
    ws = _weights(c, p)
    got = fused_bottleneck(x, *ws, block_n=2, interpret=True)
    want = fused_bottleneck_reference(x, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_fused_bottleneck_matches_folded_flax_block():
    from tests.test_fold_bn import _nontrivial_stats
    from tmrnet_tpu.models.fold_bn import fold_resnet
    from tmrnet_tpu.models.resnet import Bottleneck

    c, p = 32, 8
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, c))
    block = Bottleneck(planes=p, strides=1)
    variables = _nontrivial_stats(block.init(jax.random.PRNGKey(2), x))
    want = block.apply(variables, x, train=False)

    # fold and feed the kernel (identity residual: c == p*4)
    folded = fold_resnet(
        {"conv1": variables["params"]["conv1"],
         "bn1": variables["params"]["bn1"],
         "layer1_0": variables["params"]},
        {"bn1": variables["batch_stats"]["bn1"],
         "layer1_0": variables["batch_stats"]})["layer1_0"]
    got = fused_bottleneck(
        x,
        folded["conv1"]["kernel"][0, 0], folded["conv1"]["bias"],
        folded["conv2"]["kernel"], folded["conv2"]["bias"],
        folded["conv3"]["kernel"][0, 0], folded["conv3"]["bias"],
        block_n=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-3)


def test_tiled_fused_bottleneck_matches_oracle():
    from tmrnet_tpu.experimental.fused_bottleneck_tiled import fused_bottleneck_tiled

    c, p = 64, 16
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, c))
    ws = _weights(c, p, seed=2)
    got = fused_bottleneck_tiled(x, *ws, block_n=2, block_h=4, interpret=True)
    want = fused_bottleneck_reference(x, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_tiled_fused_bottleneck_single_tile():
    from tmrnet_tpu.experimental.fused_bottleneck_tiled import fused_bottleneck_tiled

    c, p = 32, 8
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, c))
    ws = _weights(c, p, seed=3)
    got = fused_bottleneck_tiled(x, *ws, block_n=2, block_h=6, interpret=True)
    want = fused_bottleneck_reference(x, *ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)
