"""Pallas TPU kernel: spatially-tiled fused ResNet bottleneck (inference),
with SOFTWARE-PIPELINED (double-buffered) slab DMA.

Improves on ops/fused_bottleneck.py by tiling the H dimension so batch tiles
stay MXU-sized even at the big-activation stages. Overlapping (halo) input
windows are not expressible with BlockSpecs, so the input is zero-padded in
HBM once (H+2, W+2 — a single cheap XLA pad) and each grid step DMAs its
(Nb, Ht+2, W+2, C) slab from ANY/HBM into VMEM scratch explicitly.

Round-1 lesson (docs/PERFORMANCE.md): a single-buffered slab DMA serializes
against compute and loses to XLA (0.6-0.9x per stage). This version overlaps
the NEXT grid step's slab DMA with the CURRENT step's compute: the slab
scratch holds two slots, grid steps are linearized, and step k starts the
DMA for step k+1 into the other slot before computing on its own. Mosaic
cannot dynamic-index VMEM in compute, so the active slot is copied to a
fixed 'cur' buffer under a parity branch (VMEM->VMEM, ~microseconds vs the
step's matmuls).

Per block: one HBM read of x (plus the pad copy) and one write of the output,
versus ~6 activation round-trips for the XLA conv pipeline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(xp_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref, o_ref,
            slab_ref, cur_ref, y1_ref, acc_ref, sem, *, out_w: int):
    two, nb, hpad, wpad, c = slab_ref.shape
    ht = hpad - 2
    w = out_w          # wpad is 8-aligned (Mosaic DMA tiling); true W passed in
    p = w1_ref.shape[1]
    i = pl.program_id(0)   # batch tile
    j = pl.program_id(1)   # H tile
    nj = pl.num_programs(1)
    step = i * nj + j
    total = pl.num_programs(0) * nj
    slot = jax.lax.rem(step, 2)

    def get_dma(buf, s):
        bi = s // nj
        hj = jax.lax.rem(s, nj)
        return pltpu.make_async_copy(
            xp_ref.at[pl.ds(bi * nb, nb), pl.ds(hj * ht, hpad)],
            slab_ref.at[buf], sem.at[buf])

    # warm-up: the very first step must issue its own DMA
    @pl.when(step == 0)
    def _():
        get_dma(0, 0).start()

    # pipeline: start the NEXT step's slab DMA into the other slot, then
    # wait only for our own — the next fetch overlaps this step's compute
    @pl.when(step + 1 < total)
    def _():
        get_dma(1 - slot, step + 1).start()

    get_dma(slot, step).wait()

    # stage the active slot into the fixed compute buffer (Mosaic cannot
    # dynamic-index VMEM in compute; this VMEM->VMEM copy is ~noise)
    @pl.when(slot == 0)
    def _():
        cur_ref[:] = slab_ref[0]

    @pl.when(slot == 1)
    def _():
        cur_ref[:] = slab_ref[1]

    # 1x1 reduce + relu over the halo'd slab
    x = cur_ref[:]
    y1 = jnp.dot(x.reshape(nb * hpad * wpad, c), w1_ref[:],
                 preferred_element_type=jnp.float32)
    y1 = jax.nn.relu(y1 + b1_ref[0, :].astype(jnp.float32))
    y1_ref[:] = y1.reshape(nb, hpad, wpad, p).astype(y1_ref.dtype)

    # the 3x3 conv zero-pads Y1, but the slab's image-boundary halo came from
    # zero-padded X, where y1 = relu(b1) != 0 — zero those halo positions
    zeros_row = jnp.zeros((nb, 1, wpad, p), y1_ref.dtype)
    y1_ref[:, :, 0:1, :] = jnp.zeros((nb, hpad, 1, p), y1_ref.dtype)
    y1_ref[:, :, w + 1:w + 2, :] = jnp.zeros((nb, hpad, 1, p), y1_ref.dtype)

    @pl.when(j == 0)
    def _():
        y1_ref[:, 0:1, :, :] = zeros_row

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        y1_ref[:, hpad - 1:hpad, :, :] = zeros_row

    # 3x3: 9 shifted-tap matmuls into the f32 accumulator (interior rows/cols)
    acc_ref[:] = jnp.broadcast_to(b2_ref[0, :].astype(jnp.float32),
                                  acc_ref.shape)
    y1v = y1_ref[:]
    for dy in range(3):
        for dx in range(3):
            xs = y1v[:, dy:dy + ht, dx:dx + w, :].reshape(nb * ht * w, p)
            acc_ref[:] += jnp.dot(xs, w2_ref[dy, dx],
                                  preferred_element_type=jnp.float32)
    y2 = jax.nn.relu(acc_ref[:]).astype(x.dtype)          # (nb*ht*w, P)

    # 1x1 expand + residual + relu, row-chunked to bound f32 temporaries
    y2r = y2.reshape(nb, ht, w, p)
    rows = 4 if ht % 4 == 0 else (2 if ht % 2 == 0 else 1)
    for r in range(0, ht, rows):
        chunk = y2r[:, r:r + rows].reshape(nb * rows * w, p)
        y3 = jnp.dot(chunk, w3_ref[:], preferred_element_type=jnp.float32)
        y3 = y3 + b3_ref[0, :].astype(jnp.float32)
        res = cur_ref[:, 1 + r:1 + r + rows, 1:1 + w, :]
        out = jax.nn.relu(y3.reshape(nb, rows, w, c)
                          + res.astype(jnp.float32))
        o_ref[:, r:r + rows] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_n", "block_h",
                                             "interpret"))
def fused_bottleneck_tiled(x, w1, b1, w2, b2, w3, b3, block_n: int = 8,
                           block_h: int = 14, interpret: bool = False):
    """x (N, H, W, C); w1 (C, P), w2 (3, 3, P, P), w3 (P, C); folded biases.
    H must divide by block_h; N by block_n (pad upstream)."""
    n, h, w, c = x.shape
    p = w1.shape[1]
    nb = min(block_n, n)
    ht = min(block_h, h)
    # W side pads to an 8-aligned slab width (Mosaic DMA slices must align
    # the second-to-last dim to the (8, 128) tiling). N pads to a multiple of
    # the batch tile: the manual slab DMA would otherwise read past the end
    # (Mosaic clamps the slice START, silently corrupting the last real row).
    wpad = -(-(w + 2) // 8) * 8
    npad = -(-n // nb) * nb
    xp = jnp.pad(x, ((0, npad - n), (1, 1), (1, wpad - w - 1), (0, 0)))
    w1, w2, w3 = (jnp.asarray(wi, x.dtype) for wi in (w1, w2, w3))
    two_d = lambda b: jnp.asarray(b, jnp.float32).reshape(1, -1)
    full = lambda shape: pl.BlockSpec(shape, lambda i, j: tuple(
        0 for _ in shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, out_w=w),
        grid=(pl.cdiv(n, nb), pl.cdiv(h, ht)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded x stays in HBM
            full((c, p)), full((1, p)),
            full((3, 3, p, p)), full((1, p)),
            full((p, c)), full((1, c)),
        ],
        out_specs=pl.BlockSpec((nb, ht, w, c), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, nb, ht + 2, wpad, c), x.dtype),  # double slab
            pltpu.VMEM((nb, ht + 2, wpad, c), x.dtype),     # active slab copy
            pltpu.VMEM((nb, ht + 2, wpad, p), x.dtype),     # y1 slab
            pltpu.VMEM((nb * ht * w, p), jnp.float32),      # conv2 accumulator
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, w1, two_d(b1), w2, two_d(b2), w3, two_d(b3))
