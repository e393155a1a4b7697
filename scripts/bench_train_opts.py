#!/usr/bin/env python
"""Backward-conv ablation part 2 (VERDICT r3 #5): XLA *compiler options*
over the real stage-2 train step.

`XLA_FLAGS=--xla_tpu_*` is structurally unavailable on this host: the local
client's XLA build has no TPU compiler (it aborts with "Unknown flag"), and
TPU compilation happens in a remote compile service. But per-program
compiler options ARE forwarded and validated remotely —
`jit(...).lower(...).compile(compiler_options={...})` returns a working
executable, and a bogus option name fails with an HTTP 500 from the compile
service (both measured, round 4). So candidate `xla_tpu_*` knobs are
benchmarked HERE, AOT, one executable per option set, same timing
methodology as bench.py --mode train (FIFO-drain with a trailing fetch).

Results land in docs/PERFORMANCE.md "Backward-conv ablation" whether
positive or null.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CANDIDATES = [
    ("baseline", None),
    ("scoped_vmem_49152", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("scoped_vmem_65536", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
    ("scoped_vmem_98304", {"xla_tpu_scoped_vmem_limit_kib": "98304"}),
    ("no_rwb_fusion", {"xla_tpu_rwb_fusion": "false"}),
    ("no_multi_output_fusion",
     {"xla_tpu_enable_multi_output_fusion": "false"}),
    ("flm_device", {"xla_tpu_memory_bound_loop_optimizer_options":
                    "enabled:true"}),
]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16, help="clips per step")
    ap.add_argument("--img", type=int, default=224)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--only", default=None,
                    help="comma list of candidate names to run")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from tmrnet_tpu.config import ModelConfig, TrainConfig
    from tmrnet_tpu.memory.lfb import gather_memory_windows
    from tmrnet_tpu.models.tmrnet import build_model
    from tmrnet_tpu.train.optim import make_optimizer
    from tmrnet_tpu.train.state import create_train_state
    from tmrnet_tpu.train.steps import make_stage2_steps

    seq, b, window = 10, args.batch, 30
    cfg = ModelConfig(backbone="resnet50", head="tmr", num_classes=7,
                      hidden_dim=512, compute_dtype="bfloat16")
    model = build_model(cfg)
    clips = jax.random.normal(jax.random.PRNGKey(0),
                              (b, seq, args.img, args.img, 3), jnp.bfloat16)
    bankf = jax.random.normal(jax.random.PRNGKey(1), (4096, 512),
                              jnp.bfloat16)
    rows = jnp.arange(100, 100 + b, dtype=jnp.int32)
    memory = gather_memory_windows(bankf, rows, jnp.zeros((b,), jnp.int32),
                                   window)
    labels = jnp.zeros((b,), jnp.int32)
    variables = model.init(jax.random.PRNGKey(2), clips, memory)
    tx = make_optimizer(TrainConfig(optimizer="sgd", lr=1e-3),
                        variables["params"],
                        slow_modules=("backbone", "encoder"))
    state = create_train_state(model, variables, tx)
    train_step, _ = make_stage2_steps(class_weights=np.ones(7))

    rng = jax.random.PRNGKey(3)
    lowered = train_step.lower(state, clips, memory, labels, rng)
    only = set(args.only.split(",")) if args.only else None
    results = []
    for name, opts in CANDIDATES:
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            ex = lowered.compile(compiler_options=opts)
        except Exception as e:  # option unknown to this TPU compiler version
            print(json.dumps({"name": name, "error": str(e)[:160]}),
                  flush=True)
            continue
        compile_s = time.perf_counter() - t0
        # the step donates its state: give each candidate a fresh deep copy
        st0 = jax.tree_util.tree_map(
            lambda x: jnp.array(x) if isinstance(x, jax.Array) else x, state)
        # warm + drain (block_until_ready lies on axon: sync via np.asarray)
        st, m = ex(st0, clips, memory, labels, rng)
        np.asarray(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            st, m = ex(st, clips, memory, labels, rng)
        np.asarray(m["loss"])
        dt = (time.perf_counter() - t0) / args.iters
        row = {"name": name, "ms_per_step": round(dt * 1e3, 2),
               "frames_per_sec": round(b * seq / dt, 1),
               "compile_s": round(compile_s, 1)}
        results.append(row)
        print(json.dumps(row), flush=True)
    if results:
        base = next((r for r in results if r["name"] == "baseline"),
                    results[0])
        for r in results:
            r["vs_baseline"] = round(
                base["ms_per_step"] / r["ms_per_step"], 3)
        print(json.dumps({"summary": results}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
