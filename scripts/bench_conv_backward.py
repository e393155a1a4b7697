#!/usr/bin/env python
"""Backward-conv ablation (VERDICT r3 #5): is the 28%-MFU train ceiling
movable with layout or XLA-flag choices?

Round-3 measurement: the stage-2 train step runs at 55 TFLOP/s (28% MFU)
while forward-only runs at 90 TFLOP/s — backward convs execute at ~half
forward efficiency (docs/PERFORMANCE.md "Training MFU"). This script
measures the candidate levers directly:

  1. per-stage 3x3 conv fwd vs fwd+bwd in NHWC (the model's layout)
  2. the same in NCHW (torch-style layout)
  3. (driver) `bench.py --mode train` re-run under candidate XLA_FLAGS —
     run manually, flags must be set before process start:
       XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
           python bench.py --mode train

Timing uses the traced-trip-count methodology (CLAUDE.md): the same
compiled fori_loop program at two trip counts, delta/(R2-R1), so the
~30 ms tunnel fetch RTT cancels.

Results land in docs/PERFORMANCE.md "Backward-conv ablation" whether
positive or null.
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import numpy as np


# ResNet-50 3x3 conv shapes at 224x224 input, B=16 clips x 10 frames = 160
# images (the train-step workload): (spatial, channels).
STAGES = {
    "stage1": (56, 64),
    "stage2": (28, 128),
    "stage3": (14, 256),
    "stage4": (7, 512),
}


def timed_rate(fn, r1: int = 4, r2: int = 24, repeats: int = 3):
    """Seconds per loop iteration via the two-trip-count delta.

    The warmup fetches matter: executions queue FIFO on the single chip
    and `np.asarray` is the only reliable sync on this host (CLAUDE.md),
    so un-drained compile dispatches would land inside the first timed
    segment (measured: -36 s "forward times" in the first attempt).
    Tunnel jitter can still make a single delta negative (measured once at
    stage4/NCHW): take the median of `repeats` deltas and repeat with
    doubled trip counts while the median stays non-positive."""
    np.asarray(fn(r1))  # compile AND drain before timing
    np.asarray(fn(r2))
    for scale in (1, 2, 4):
        a, b = r1 * scale, r2 * scale
        np.asarray(fn(a))
        np.asarray(fn(b))
        deltas = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            np.asarray(fn(a))
            t1 = time.perf_counter()
            np.asarray(fn(b))
            t2 = time.perf_counter()
            deltas.append(((t2 - t1) - (t1 - t0)) / (b - a))
        med = sorted(deltas)[len(deltas) // 2]
        if med > 0:
            return med
    raise RuntimeError(f"timing never stabilized: {deltas}")


def conv_flops(b, hw, c, k=3):
    return 2 * b * hw * hw * k * k * c * c


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=160,
                    help="images per step (16 clips x 10 frames)")
    ap.add_argument("--inner", type=int, default=8,
                    help="convs chained per loop iteration")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    dn_by_layout = {
        "NHWC": ("NHWC", "HWIO", "NHWC"),
        "NCHW": ("NCHW", "OIHW", "NCHW"),
    }

    results = []
    for stage, (hw, c) in STAGES.items():
        for layout, dn in dn_by_layout.items():
            shape = ((args.batch, hw, hw, c) if layout == "NHWC"
                     else (args.batch, c, hw, hw))
            kshape = (3, 3, c, c) if layout == "NHWC" else (c, c, 3, 3)
            x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.bfloat16)
            w = jax.random.normal(jax.random.PRNGKey(1), kshape,
                                  jnp.bfloat16) * 0.01

            def raw_chain(w, x, dn=dn):
                y = x
                for _ in range(args.inner):
                    y = jax.lax.conv_general_dilated(
                        y, w, (1, 1), "SAME", dimension_numbers=dn)
                    y = jax.nn.relu(y)
                return y

            def chain(w, x):
                return jnp.sum(raw_chain(w, x).astype(jnp.float32))

            grad_chain = jax.grad(chain)

            @functools.partial(jax.jit, static_argnums=2)
            def loop_fwd(w, x, r):
                def body(i, xx):
                    y = raw_chain(w, xx)
                    # renormalize so magnitudes stay finite while the loop
                    # carries a real data dependency (XLA cannot hoist the
                    # chain out); one reduction per iter, noise vs 8 convs
                    yf = y.astype(jnp.float32)
                    scale = jax.lax.rsqrt(
                        jnp.float32(1e-6) + jnp.mean(yf * yf))
                    return (yf * scale).astype(xx.dtype)

                return jnp.sum(jax.lax.fori_loop(0, r, body, x)
                               .astype(jnp.float32))

            @functools.partial(jax.jit, static_argnums=2)
            def loop_bwd(w, x, r):
                def body(i, ww):
                    g = grad_chain(ww, x)
                    return ww - (1e-9 * g.astype(jnp.float32)).astype(w.dtype)

                return jnp.sum(jax.lax.fori_loop(0, r, body, w)
                               .astype(jnp.float32))

            fwd_s = timed_rate(lambda r: loop_fwd(w, x, r))
            full_s = timed_rate(lambda r: loop_bwd(w, x, r))
            fl = conv_flops(args.batch, hw, c) * args.inner
            fwd_tf = fl / fwd_s / 1e12
            # backward = dW + dX convs = 2x forward FLOPs
            bwd_s = max(full_s - fwd_s, 1e-9)
            bwd_tf = 2 * fl / bwd_s / 1e12
            row = {"stage": stage, "layout": layout, "hw": hw, "c": c,
                   "fwd_tflops": round(fwd_tf, 1),
                   "bwd_tflops": round(bwd_tf, 1),
                   "fwd_ms": round(fwd_s * 1e3, 2),
                   "bwd_ms": round(bwd_s * 1e3, 2),
                   "bwd_over_fwd_wallclock": round(bwd_s / fwd_s, 2)}
            results.append(row)
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
