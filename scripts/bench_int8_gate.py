"""Int8 gate, RTT-corrected (the round-3 measurement that closed the
int8-for-convs line; see docs/PERFORMANCE.md "Int8 backbone: measured
dead end" for the result table).

Original note: Int8 gate, RTT-corrected. The first gate's numbers carried the ~30 ms
tunnel fetch RTT (the requant-only chain timed the same as full compute).
Here the fori_loop trip count is a TRACED argument, so one compiled program
runs at both R=20 and R=120 and the timing delta is pure compute for 100
iterations — dispatch and fetch cancel.

Measures per stage shape: full bottleneck chain (bf16 XLA vs int8 Pallas),
3x3-conv-only chain, and 1x1-only chain.
"""

import argparse
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from tmrnet_tpu.ops.quant import int8_matmul
from tmrnet_tpu.experimental.quant_conv import int8_conv3x3

STAGES = [
    ("stage1", 56, 256, 64, 1),
    ("stage2", 28, 512, 128, 4),
    ("stage3", 14, 1024, 256, 8),
    ("stage4", 7, 2048, 512, 8),
]
DN = ("NHWC", "HWIO", "NHWC")
R0, R1 = 20, 120


def requant(y, scale):
    return jnp.clip(jnp.round(y * (1.0 / scale)), -127, 127).astype(jnp.int8)


def chain(f):
    @jax.jit
    def run(r, x, *ws):
        out = jax.lax.fori_loop(0, r, lambda i, c: f(c, *ws), x)
        return out.astype(jnp.float32).sum()
    return run


def time_delta(run, args, reps=3):
    """Seconds per iteration of the chained op, RTT-cancelled."""
    np.asarray(run(R0, *args))
    np.asarray(run(R1, *args))      # both trip counts warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(R0, *args))
        d0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(run(R1, *args))
        d1 = time.perf_counter() - t0
        best = min(best, (d1 - d0) / (R1 - R0))
    return best


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--stages", default="stage1,stage2,stage3,stage4")
    p.add_argument("--what", default="bneck,conv3,mm")
    args = p.parse_args()
    b = args.batch
    want = set(args.stages.split(","))
    what = set(args.what.split(","))
    key = jax.random.PRNGKey(0)

    for name, h, cin, cmid, bn in STAGES:
        if name not in want:
            continue
        m = b * h * h
        ks = jax.random.split(key, 4)
        x = jax.random.normal(ks[0], (b, h, h, cin), jnp.bfloat16) * 0.1
        xm = jax.random.normal(ks[0], (b, h, h, cmid), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(ks[1], (1, 1, cin, cmid), jnp.bfloat16) * 0.05
        w2 = jax.random.normal(ks[2], (3, 3, cmid, cmid), jnp.bfloat16) * 0.05
        w3 = jax.random.normal(ks[3], (1, 1, cmid, cin), jnp.bfloat16) * 0.05
        b1 = jnp.zeros((cmid,), jnp.bfloat16)
        b3 = jnp.zeros((cin,), jnp.bfloat16)
        xq = requant(x.astype(jnp.float32), 0.05)
        xmq = requant(xm.astype(jnp.float32), 0.05)
        w1q = requant(w1.astype(jnp.float32), 0.005)
        w2q = requant(w2.astype(jnp.float32), 0.005)
        w3q = requant(w3.astype(jnp.float32), 0.005)
        sm = jnp.full((cmid,), 0.005, jnp.float32)
        sc = jnp.full((cin,), 0.005, jnp.float32)
        row = {"stage": name, "batch": b}

        if "bneck" in what:
            fl = 2 * m * (cin * cmid + 9 * cmid * cmid + cmid * cin)

            def bf(y, w1, b1, w2, b2, w3, b3):
                z = jax.lax.conv_general_dilated(
                    y, w1, (1, 1), "VALID", dimension_numbers=DN) + b1
                z = jnp.maximum(z, 0)
                z = jax.lax.conv_general_dilated(
                    z, w2, (1, 1), "SAME", dimension_numbers=DN) + b2
                z = jnp.maximum(z, 0)
                z = jax.lax.conv_general_dilated(
                    z, w3, (1, 1), "VALID", dimension_numbers=DN) + b3
                return jnp.maximum(z + y, 0)

            def i8(yq, w1q, s1, w2q, s2, w3q, s3):
                bb, hh, ww, cc = yq.shape
                z = int8_matmul(yq.reshape(bb * hh * ww, cc), w1q,
                                jnp.float32(0.05), s1, out_dtype=jnp.float32)
                z = requant(jnp.maximum(z, 0), 0.05).reshape(bb, hh, ww, cmid)
                z = int8_conv3x3(z, w2q, jnp.float32(0.05), s2, block_n=bn,
                                 out_dtype=jnp.float32)
                z = requant(jnp.maximum(z, 0), 0.05)
                z = int8_matmul(z.reshape(bb * hh * ww, cmid), w3q,
                                jnp.float32(0.05), s3, out_dtype=jnp.float32)
                z = z.reshape(bb, hh, ww, cc) + yq.astype(jnp.float32) * 0.05
                return requant(jnp.maximum(z, 0), 0.05)

            dt_b = time_delta(chain(bf), (x, w1, b1, w2, b1, w3, b3))
            dt_i = time_delta(chain(i8), (xq, w1q.reshape(cin, cmid), sm,
                                          w2q, sm, w3q.reshape(cmid, cin),
                                          sc))
            row.update(bneck_bf16_ms=round(dt_b * 1e3, 3),
                       bneck_int8_ms=round(dt_i * 1e3, 3),
                       bneck_bf16_tflops=round(fl / dt_b / 1e12, 1),
                       bneck_int8_tops=round(fl / dt_i / 1e12, 1),
                       bneck_speedup=round(dt_b / dt_i, 2))

        if "conv3" in what:
            fl = 2 * m * 9 * cmid * cmid
            dt_b = time_delta(chain(
                lambda y, w: jax.lax.conv_general_dilated(
                    y, w, (1, 1), "SAME", dimension_numbers=DN)), (xm, w2))
            dt_i = time_delta(chain(
                lambda y, w, s: requant(int8_conv3x3(
                    y, w, jnp.float32(0.05), s, block_n=bn,
                    out_dtype=jnp.float32), 0.05)), (xmq, w2q, sm))
            row.update(conv3_bf16_ms=round(dt_b * 1e3, 3),
                       conv3_int8_ms=round(dt_i * 1e3, 3),
                       conv3_bf16_tflops=round(fl / dt_b / 1e12, 1),
                       conv3_int8_tops=round(fl / dt_i / 1e12, 1),
                       conv3_speedup=round(dt_b / dt_i, 2))

        if "mm" in what:
            fl = 2 * m * cmid * cmid
            w11 = jax.random.normal(ks[1], (1, 1, cmid, cmid),
                                    jnp.bfloat16) * 0.05
            w11q = requant(w11.astype(jnp.float32), 0.005)
            dt_b = time_delta(chain(
                lambda y, w: jax.lax.conv_general_dilated(
                    y, w, (1, 1), "VALID", dimension_numbers=DN)), (xm, w11))

            def mm_i8(y, w, s):
                bb, hh, ww, cc = y.shape
                out = int8_matmul(y.reshape(bb * hh * ww, cc), w,
                                  jnp.float32(0.05), s,
                                  out_dtype=jnp.float32)
                return requant(out, 0.05).reshape(bb, hh, ww, cc)

            dt_i = time_delta(chain(mm_i8),
                              (xmq, w11q.reshape(cmid, cmid), sm))
            row.update(mm_bf16_ms=round(dt_b * 1e3, 3),
                       mm_int8_ms=round(dt_i * 1e3, 3),
                       mm_bf16_tflops=round(fl / dt_b / 1e12, 1),
                       mm_int8_tops=round(fl / dt_i / 1e12, 1),
                       mm_speedup=round(dt_b / dt_i, 2))

        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
