"""Pallas TPU kernel: fused multi-scale temporal conv pyramid.

Fuses the reference TimeConv (`NLBlock_MutiConv6_3.py:52-79`) — three Conv1d
branches (k=3,5,7), the causal 2-max-pool branch, the identity, and the
branch-wise max — into a single kernel. Each conv tap is a (Bt*W, C) @ (C, C)
MXU matmul over the VMEM-resident input block, so the memory window is read
from HBM once and the five intermediate branch tensors never materialize in
HBM (the XLA fallback writes each branch out before the max).

VMEM strategy: the three kernels are packed into one tap-aligned (3, 7, C, C)
tensor (k=3 occupies taps 2..4, k=5 taps 1..5, k=7 taps 0..6; unused taps are
zero, contributing nothing). The grid is (batch_tiles, 3 branches): each grid
step holds only ONE branch's (7, C, C) slab in VMEM, and the output block is
revisited across the branch dimension carrying the running max (initialized at
branch 0 with the identity and causal-max-pool branches). A 512-wide f32 slab
is 7*512*512*4 = 7.3 MB, fitting the 16 MB VMEM budget with double buffering
at block_b=32 (the earlier all-branches-resident design needed 46 MB).

x: (B, W, C); weights in flax layout (k, C, C); biases (C,). Returns (B, W, C).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_K = 7
_MAX_PAD = _MAX_K // 2


def pack_time_conv_weights(w3, b3, w5, b5, w7, b7):
    """Stack per-branch conv weights tap-aligned to kernel size 7."""
    c = w3.shape[-1]
    dt = w3.dtype
    ws = jnp.zeros((3, _MAX_K, c, c), dt)
    ws = ws.at[0, 2:5].set(w3)
    ws = ws.at[1, 1:6].set(w5)
    ws = ws.at[2, 0:7].set(w7)
    # (3, 1, C): keeps the trailing-two block dims equal to the array dims,
    # as Mosaic's tiling rules require for the per-branch bias slice.
    bs = jnp.stack([b3, b5, b7]).astype(dt)[:, None, :]
    return ws, bs


def _kernel(x_ref, w_ref, b_ref, out_ref):
    x = x_ref[:].astype(jnp.float32)                     # (Bt, W, C)
    bt, w, c = x.shape
    padded = jnp.pad(x, ((0, 0), (_MAX_PAD, _MAX_PAD), (0, 0)))

    def shifted(ofs):  # ofs is a Python int -> static slice
        s = _MAX_PAD + ofs
        return padded[:, s:s + w, :]

    branch = pl.program_id(1)

    @pl.when(branch == 0)
    def _():
        # identity + causal 2-max-pool seed the running max
        out_ref[:] = jnp.maximum(x, shifted(-1)).astype(out_ref.dtype)

    acc = jnp.zeros((bt * w, c), jnp.float32)
    for tap in range(_MAX_K):  # static unroll; one MXU matmul per tap
        xs = shifted(tap - _MAX_PAD).reshape(bt * w, c)
        acc = acc + jnp.dot(xs, w_ref[0, tap].astype(jnp.float32),
                            preferred_element_type=jnp.float32)
    conv = (acc + b_ref[0].astype(jnp.float32)).reshape(bt, w, c)
    out_ref[:] = jnp.maximum(out_ref[:].astype(jnp.float32),
                             conv).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def time_conv_fused(x: jax.Array, w3, b3, w5, b5, w7, b7,
                    block_b: int = 32, interpret: bool = False) -> jax.Array:
    b, w, c = x.shape
    ws, bs = pack_time_conv_weights(w3, b3, w5, b5, w7, b7)
    bt = min(block_b, b)
    grid = (pl.cdiv(b, bt), 3)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, w, c), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _MAX_K, c, c), lambda i, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, c), lambda i, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, w, c), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, w, c), x.dtype),
        interpret=interpret,
    )(x, ws, bs)


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
