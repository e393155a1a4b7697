"""Pallas TPU kernel: fused multi-scale temporal conv pyramid.

Fuses the reference TimeConv (`NLBlock_MutiConv6_3.py:52-79`) — three Conv1d
branches (k=3,5,7), the causal 2-max-pool branch, the identity, and the
branch-wise max — into a single kernel. Each conv tap is a (Bt*W, C) @ (C, C)
MXU matmul over the VMEM-resident input block, so the memory window is read
from HBM once and the five intermediate branch tensors never materialize in
HBM (the XLA fallback writes each branch out before the max).

x: (B, W, C); weights in flax layout (k, C, C); biases (C,). Returns (B, W, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_PAD = 3  # largest kernel (7) // 2


def _kernel(x_ref, w3_ref, b3_ref, w5_ref, b5_ref, w7_ref, b7_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)                     # (Bt, W, C)
    bt, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (_MAX_PAD, _MAX_PAD), (0, 0)))

    def shifted(ofs):
        # ofs is a Python int -> static slice (dynamic_slice has no Mosaic
        # lowering on TPU)
        s = _MAX_PAD + ofs
        return padded[:, s:s + w, :]

    def conv_branch(w_ref, b_ref, k):
        acc = jnp.zeros((bt * w, c), jnp.float32)
        for tap in range(k):  # static unroll; each tap is one MXU matmul
            xs = shifted(tap - k // 2).reshape(bt * w, c)
            acc = acc + jnp.dot(xs, w_ref[tap].astype(jnp.float32),
                                preferred_element_type=jnp.float32)
        return (acc + b_ref[:].astype(jnp.float32)).reshape(bt, w, c)

    out = x                                              # identity branch
    out = jnp.maximum(out, conv_branch(w3_ref, b3_ref, 3))
    out = jnp.maximum(out, conv_branch(w5_ref, b5_ref, 5))
    out = jnp.maximum(out, conv_branch(w7_ref, b7_ref, 7))
    out = jnp.maximum(out, jnp.maximum(x, shifted(-1)))  # causal 2-max-pool
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def time_conv_fused(x: jax.Array, w3, b3, w5, b5, w7, b7,
                    block_b: int = 64, interpret: bool = False) -> jax.Array:
    b, w, c = x.shape
    bt = min(block_b, b)
    grid = (pl.cdiv(b, bt),)
    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, w, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((3, c, c)), full((c,)),
            full((5, c, c)), full((c,)),
            full((7, c, c)), full((c,)),
        ],
        out_specs=pl.BlockSpec((bt, w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w, c), x.dtype),
        interpret=interpret,
    )(x, w3, b3, w5, b5, w7, b7)


def time_conv_reference(x, w3, b3, w5, b5, w7, b7):
    """Plain-XLA oracle (mirrors models.blocks.TimeConv math)."""
    xf = x.astype(jnp.float32)

    def conv(wk, bk, k):
        out = jax.lax.conv_general_dilated(
            xf, wk.astype(jnp.float32), window_strides=(1,),
            padding=[(k // 2, k // 2)],
            dimension_numbers=("NWC", "WIO", "NWC"))
        return out + bk

    shifted = jnp.pad(xf, ((0, 0), (1, 0), (0, 0)))[:, :-1, :]
    out = jnp.maximum(xf, conv(w3, b3, 3))
    out = jnp.maximum(out, conv(w5, b5, 5))
    out = jnp.maximum(out, conv(w7, b7, 7))
    out = jnp.maximum(out, jnp.maximum(xf, shifted))
    return out.astype(x.dtype)
