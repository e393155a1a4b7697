"""Pallas kernel tests in interpreter mode (CPU) against XLA oracles and the
flax block implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.models.blocks import TimeConv
from tmrnet_tpu.ops.nl_attention import nl_attention, nl_attention_reference
from tmrnet_tpu.ops.time_conv import time_conv_fused, time_conv_reference


def test_nl_attention_matches_reference():
    rng = jax.random.PRNGKey(0)
    b, w, f = 16, 30, 512
    q = jax.random.normal(rng, (b, f))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, w, f))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, w, f))
    got = nl_attention(q, k, v, interpret=True)
    want = nl_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_nl_attention_grid_tiling():
    # b not a multiple of block_b exercises the grid's ragged edge
    b, w, f = 48, 8, 128
    rng = jax.random.PRNGKey(3)
    q = jax.random.normal(rng, (b, f))
    k = jax.random.normal(jax.random.fold_in(rng, 1), (b, w, f))
    v = jax.random.normal(jax.random.fold_in(rng, 2), (b, w, f))
    got = nl_attention(q, k, v, block_b=32, interpret=True)
    want = nl_attention_reference(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def _tc_weights(c, seed=0):
    rng = np.random.RandomState(seed)
    mk = lambda k: (rng.randn(k, c, c).astype(np.float32) * 0.05,
                    rng.randn(c).astype(np.float32) * 0.1)
    w3, b3 = mk(3)
    w5, b5 = mk(5)
    w7, b7 = mk(7)
    return w3, b3, w5, b5, w7, b7


def test_time_conv_fused_matches_reference():
    b, w, c = 8, 30, 128
    x = jax.random.normal(jax.random.PRNGKey(0), (b, w, c))
    weights = tuple(jnp.asarray(a) for a in _tc_weights(c))
    got = time_conv_fused(x, *weights, interpret=True)
    want = time_conv_reference(x, *weights)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_time_conv_fused_matches_flax_block():
    b, w, c = 4, 30, 64
    x = jax.random.normal(jax.random.PRNGKey(1), (b, w, c))
    block = TimeConv(feature_dim=c)
    variables = block.init(jax.random.PRNGKey(2), x)
    want = block.apply(variables, x)
    p = variables["params"]
    got = time_conv_fused(
        x, p["conv_k3"]["kernel"], p["conv_k3"]["bias"],
        p["conv_k5"]["kernel"], p["conv_k5"]["bias"],
        p["conv_k7"]["kernel"], p["conv_k7"]["bias"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-4, rtol=1e-4)


def test_nlblock_use_pallas_flag():
    # NLBlock(use_pallas=True) routes through the kernel; on CPU this only
    # works in interpret mode, so monkeypatch the entry to interpret.
    import sys

    import tmrnet_tpu.ops.nl_attention  # noqa: F401  (ensure registered)

    # the package __init__ shadows the submodule name with the function;
    # fetch the real module from sys.modules
    nla = sys.modules["tmrnet_tpu.ops.nl_attention"]

    orig = nla.nl_attention
    try:
        import functools

        nla.nl_attention = functools.partial(orig, interpret=True)
        from tmrnet_tpu.models.blocks import NLBlock

        f = 64
        st = jax.random.normal(jax.random.PRNGKey(0), (3, f))
        lt = jax.random.normal(jax.random.PRNGKey(1), (3, 10, f))
        m_plain = NLBlock(feature_dim=f, use_pallas=False)
        variables = m_plain.init(jax.random.PRNGKey(2), st, lt)
        want = m_plain.apply(variables, st, lt, deterministic=True)
        m_pallas = NLBlock(feature_dim=f, use_pallas=True)
        got = m_pallas.apply(variables, st, lt, deterministic=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, rtol=1e-5)
    finally:
        nla.nl_attention = orig
