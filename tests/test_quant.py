"""Int8 quantized matmul kernel tests (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tmrnet_tpu.ops.quant import (
    int8_matmul,
    quantize_per_channel,
    quantize_per_tensor,
    quantized_matmul,
)


def test_quantize_roundtrip_error_bounded():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 32).astype(np.float32)
    q, s = quantize_per_tensor(jnp.asarray(x))
    err = np.abs(np.asarray(q, np.float32) * float(s) - x).max()
    assert err <= float(s) * 0.5 + 1e-6  # half-ULP of the int8 grid

    w = rng.randn(32, 16).astype(np.float32)
    wq, ws = quantize_per_channel(jnp.asarray(w), axis=1)
    back = np.asarray(wq, np.float32) * np.asarray(ws)[None, :]
    col_err = np.abs(back - w).max(axis=0)
    assert (col_err <= np.asarray(ws) * 0.5 + 1e-6).all()


def test_int8_matmul_exact_small_ints():
    # integer inputs that quantize exactly -> exact results
    a = jnp.asarray(np.random.RandomState(1).randint(-50, 50, (32, 128)),
                    jnp.int8)
    b = jnp.asarray(np.random.RandomState(2).randint(-50, 50, (128, 64)),
                    jnp.int8)
    out = int8_matmul(a, b, jnp.float32(1.0), jnp.ones(64),
                      block_m=16, block_n=32, block_k=64, interpret=True)
    want = np.asarray(a, np.int32) @ np.asarray(b, np.int32)
    np.testing.assert_array_equal(np.asarray(out), want.astype(np.float32))


def test_quantized_matmul_close_to_float():
    rng = np.random.RandomState(3)
    x = rng.randn(48, 256).astype(np.float32)
    w = rng.randn(256, 64).astype(np.float32)
    got = np.asarray(quantized_matmul(jnp.asarray(x), jnp.asarray(w),
                                      interpret=True))
    want = x @ w
    # int8 dynamic quantization: relative error ~1%
    rel = np.abs(got - want) / (np.abs(want).mean() + 1e-6)
    assert rel.mean() < 0.02
    assert np.corrcoef(got.ravel(), want.ravel())[0, 1] > 0.999


def test_int8_matmul_k_accumulation():
    # K spans multiple grid steps; accumulation across them must be exact
    a = jnp.ones((16, 512), jnp.int8)
    b = jnp.ones((512, 128), jnp.int8)
    out = int8_matmul(a, b, jnp.float32(2.0), jnp.full(128, 0.5),
                      block_m=16, block_n=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), 512.0)  # 512 * 2.0 * 0.5
