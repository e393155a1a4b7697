"""Measured dead ends, kept as evidence — NOT part of the live compute path.

Every module here is a working, tested implementation whose *measured*
end-to-end value on this hardware is negative; they are retired from the
shipping package (VERDICT r2 weak-3) but kept importable so their parity
tests keep guarding the record and so future work doesn't re-derive the
same negatives from scratch.

- fused_bottleneck / fused_bottleneck_tiled / fused_resnet: the bf16
  conv-backbone Pallas line, retired after four attempts. Per-stage wins
  (1.4-1.8x) but whole-model losses (5,952 vs 11,654 fps) — VMEM-feasible
  tiles starve the MXU (CLAUDE.md perf note 1).
- quant_conv (+ the int8 backbone line around ops/quant.int8_matmul):
  closed round 3 by the RTT-corrected stage-shape gate — XLA's bf16 convs
  run at 175-243 TFLOP/s in steady state at ResNet-50 shapes and the best
  int8 Pallas kernel reaches 0.77x of that (docs/PERFORMANCE.md "int8
  backbone: measured dead end"). The >=1.5x bar for integration was never
  approached.

ops/quant.py (the K-tiled int8 matmul, ~176 TOPS at large square shapes)
stays in the live package: it is a validated standalone primitive for
matmul-shaped workloads; it is ResNet *conv* shapes where int8 loses.
"""
