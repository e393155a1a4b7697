"""Int8 3x3 conv kernel vs XLA oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.ops.quant import quantize_per_channel, quantize_per_tensor
from tmrnet_tpu.experimental.quant_conv import int8_conv3x3, int8_conv3x3_reference


def test_int8_conv3x3_exact_vs_oracle():
    rng = np.random.RandomState(0)
    x_q = jnp.asarray(rng.randint(-40, 40, (4, 8, 8, 32)), jnp.int8)
    w_q = jnp.asarray(rng.randint(-20, 20, (3, 3, 32, 16)), jnp.int8)
    xs = jnp.float32(0.05)
    ws = jnp.asarray(rng.rand(16).astype(np.float32) * 0.1)
    got = int8_conv3x3(x_q, w_q, xs, ws, block_n=2, interpret=True)
    want = int8_conv3x3_reference(x_q, w_q, xs, ws)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-3, rtol=1e-5)


def test_int8_conv3x3_quantized_close_to_float():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 8, 8, 64).astype(np.float32))
    w = jnp.asarray(rng.randn(3, 3, 64, 32).astype(np.float32) * 0.1)
    x_q, xs = quantize_per_tensor(x)
    w_q, ws = quantize_per_channel(w, axis=3)
    got = np.asarray(int8_conv3x3(x_q, w_q, xs, ws, block_n=2, interpret=True))
    want = np.asarray(jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")))
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert rel.mean() < 0.03
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.998
