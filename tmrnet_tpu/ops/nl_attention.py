"""Pallas TPU kernel: fused non-local memory read.

Fuses the NLBlock attention chain (reference `NLBlock_MutiConv6_3.py:30-34`:
QK^T -> *1/sqrt(F) -> softmax over the window -> @V) into one VMEM-resident
kernel: logits, the numerically-stable softmax, and the value contraction all
happen without round-tripping the (B, W) attention matrix through HBM.

Shapes: q (B, F), k (B, W, F), v (B, W, F) -> (B, F); W is the LFB window
(30/40), F the feature dim (512). The kernel tiles B; W and F stay whole in
VMEM (30x512 f32 = 60 KB per operand per row-block — well inside 16 MB).

Falls back to plain XLA ops off-TPU (interpret mode covers CPU tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(q_ref, k_ref, v_ref, out_ref, *, scale: float):
    q = q_ref[:].astype(jnp.float32)            # (Bt, F)
    k = k_ref[:].astype(jnp.float32)            # (Bt, W, F)
    v = v_ref[:].astype(jnp.float32)            # (Bt, W, F)
    # logits[b, w] = sum_f q[b, f] * k[b, w, f]  (VPU reduce; W is tiny)
    logits = jnp.sum(q[:, None, :] * k, axis=-1) * scale       # (Bt, W)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    attn = e / jnp.sum(e, axis=-1, keepdims=True)              # (Bt, W)
    out = jnp.sum(attn[:, :, None] * v, axis=1)                # (Bt, F)
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def nl_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                 block_b: int = 128, interpret: bool = False) -> jax.Array:
    """Fused softmax(q k^T / sqrt(F)) v.

    q: (B, F); k, v: (B, W, F) -> (B, F).
    """
    b, f = q.shape
    w = k.shape[1]
    scale = (1.0 / f) ** 0.5
    bt = min(block_b, b)
    grid = (pl.cdiv(b, bt),)
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bt, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, w, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, w, f), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, f), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, f), q.dtype),
        interpret=interpret,
    )(q, k, v)


def nl_attention_reference(q: jax.Array, k: jax.Array, v: jax.Array
                           ) -> jax.Array:
    """Plain-XLA oracle for tests."""
    f = q.shape[-1]
    logits = jnp.einsum("bf,bwf->bw", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * (1.0 / f) ** 0.5
    attn = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bw,bwf->bf", attn,
                      v.astype(jnp.float32)).astype(q.dtype)
