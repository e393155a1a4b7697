"""Int8 3x3 convolution on the MXU (Pallas) — quantized-backbone prototype.

Same recipe as ops/time_conv.py but in int8: the 3x3 SAME conv decomposes
into 9 shifted-tap matmuls (N*H*W, C) @ (C, Co), each an int8 MXU contraction
accumulated in an int32 VMEM scratch, with per-output-channel dequantization
fused into the final store. The input block is zero-padded in VMEM, so each
grid step reads its frames from HBM exactly once.

Status: validated kernel + numerics (tests); model integration is the
round-2 quantized-backbone work (CLAUDE.md). Stride-1 only for now.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_scale_ref, x_ref, w_ref, wscale_ref, o_ref, col_ref):
    x = x_ref[:]                                         # (Nb, H, W, C) int8
    nb, h, w, c = x.shape
    co = o_ref.shape[-1]
    padded = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    # VMEM im2col: stack the nine taps on the channel axis so the contraction
    # becomes ONE (Nb*H*W, 9C) @ (9C, Co) matmul — K=9C keeps the MXU full
    # where per-tap K=C matmuls ran at half throughput.
    for dy in range(3):
        for dx in range(3):
            tap = 3 * dy + dx
            col_ref[:, :, :, tap * c:(tap + 1) * c] = (
                padded[:, dy:dy + h, dx:dx + w, :])

    acc = jax.lax.dot_general(
        col_ref[:].reshape(nb * h * w, 9 * c), w_ref[:].reshape(9 * c, co),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32)
    scale = x_scale_ref[0] * wscale_ref[0, :]            # (Co,)
    out = acc.astype(jnp.float32) * scale[None, :]
    o_ref[:] = out.reshape(nb, h, w, co).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "out_dtype",
                                             "interpret"))
def int8_conv3x3(x_q: jax.Array, w_q: jax.Array, x_scale: jax.Array,
                 w_scale: jax.Array, block_n: int = 4,
                 out_dtype=jnp.float32, interpret: bool = False) -> jax.Array:
    """x_q: (N, H, W, C) int8; w_q: (3, 3, C, Co) int8; x_scale scalar;
    w_scale (Co,) -> (N, H, W, Co) out_dtype. SAME padding, stride 1."""
    n, h, w, c = x_q.shape
    co = w_q.shape[-1]
    nb = min(block_n, n)
    x_scale = jnp.reshape(x_scale, (1,)).astype(jnp.float32)
    w_scale = jnp.asarray(w_scale, jnp.float32).reshape(1, -1)
    return pl.pallas_call(
        _kernel,
        grid=(pl.cdiv(n, nb),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((nb, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 3, c, co), lambda i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, co), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, h, w, co), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), out_dtype),
        scratch_shapes=[pltpu.VMEM((nb, h, w, 9 * c), jnp.int8)],
        interpret=interpret,
    )(x_scale, x_q, w_q, w_scale)


def int8_conv3x3_reference(x_q, w_q, x_scale, w_scale):
    """XLA oracle: dequantized f32 conv of the quantized operands."""
    xf = x_q.astype(jnp.float32) * jnp.asarray(x_scale, jnp.float32)
    wf = w_q.astype(jnp.float32) * jnp.asarray(w_scale, jnp.float32)
    return jax.lax.conv_general_dilated(
        xf, wf, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
