"""AOT model artifacts: serialize the jitted inference step with jax.export.

Production serving should not need the model's Python code, a matching
framework version, or a compile farm at process start: `export_inference`
lowers the full clip-inference step (wire-dtype cast + normalization +
backbone + LSTM + memory head + softmax/argmax) to a portable StableHLO
artifact with the weights baked in as constants, and `load_artifact` runs
it back on any host with plain JAX. One file on disk = one deployable
model (+ a JSON sidecar describing the calling convention).

The reference has nothing comparable — its eval drivers re-instantiate
the torch model from source and load a `.pth` every run
(`code/eval/python/test_singlenet_phase_non-local_pretrained_2fc_copy.py:371-379`).
This is the TPU-native equivalent of a TorchScript/ONNX export, built on
`jax.export` (StableHLO serialization, multi-platform lowering).

CLI front end: `python -m tmrnet_tpu export-model`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_SIDECAR = ".json"


def export_inference(cfg, variables, batch: int,
                     platforms: Sequence[str] = ("cpu", "tpu")
                     ) -> Tuple[bytes, dict]:
    """Lower + serialize one batched inference step for `cfg.model.head`.

    Inputs of the exported function (fixed shapes — serving slots are
    static; export one artifact per batch size you deploy):
      clips:  (batch, seq, crop, crop, 3) — uint8 under
              data.device_normalize (normalization runs inside the
              artifact), float32 pre-normalized otherwise.
      memory: (batch, memory.window, hidden) float32 — tmr/nl_only heads
              only (the LFB window rows for each clip).
    Returns for tmr/nl_only/stage1: (preds (batch,) int, probs
    (batch, classes) float32) — stage-1 scores the clip's LAST frame,
    like the reference loss/eval striding
    (`train_singlenet_phase_1fc.py:551-555`). The 'lfb' head returns the
    (batch, hidden) float32 clip features instead.
    """
    from tmrnet_tpu.data.device_feed import DevicePrep
    from tmrnet_tpu.models.tmrnet import build_model

    model = build_model(cfg.model)
    cdt = jnp.dtype(cfg.model.compute_dtype)
    prep = DevicePrep(cfg.data, cdt)
    head = cfg.model.head
    seq = int(cfg.data.sequence_length)
    crop = int(cfg.data.crop_size)
    wire = jnp.uint8 if cfg.data.device_normalize else jnp.float32
    clips_spec = jax.ShapeDtypeStruct((batch, seq, crop, crop, 3), wire)

    if head in ("tmr", "nl_only"):
        def fn(clips, memory):
            logits = model.apply(variables, prep(clips),
                                 memory.astype(cdt), train=False)
            probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
            return jnp.argmax(probs, axis=-1), probs

        specs = (clips_spec,
                 jax.ShapeDtypeStruct(
                     (batch, int(cfg.memory.window),
                      int(cfg.model.hidden_dim)), jnp.float32))
    elif head == "stage1":
        def fn(clips):
            logits = model.apply(variables, prep(clips), train=False)
            probs = jax.nn.softmax(logits[:, -1].astype(jnp.float32), -1)
            return jnp.argmax(probs, axis=-1), probs

        specs = (clips_spec,)
    elif head == "lfb":
        def fn(clips):
            return model.apply(variables, prep(clips),
                               train=False).astype(jnp.float32)

        specs = (clips_spec,)
    else:
        raise ValueError(f"unknown head {head!r}")

    exported = jax.export.export(jax.jit(fn),
                                 platforms=list(platforms))(*specs)
    meta = {
        "head": head,
        "batch": batch,
        "platforms": list(platforms),
        "inputs": [{"shape": list(s.shape), "dtype": str(np.dtype(s.dtype))}
                   for s in specs],
        "num_classes": int(cfg.model.num_classes),
        "window": int(cfg.memory.window),
        "hidden_dim": int(cfg.model.hidden_dim),
        "wire": ("uint8+device-normalize" if wire == jnp.uint8
                 else "float32 pre-normalized"),
        "config": dataclasses.asdict(cfg),
    }
    return exported.serialize(), meta


def save_artifact(path: str, blob: bytes, meta: dict) -> None:
    """Write the serialized artifact + JSON sidecar atomically."""
    for p, data, mode in ((path, blob, "wb"),
                          (path + _SIDECAR, json.dumps(meta, indent=1),
                           "w")):
        tmp = p + ".tmp"
        with open(tmp, mode) as f:
            f.write(data)
        os.replace(tmp, p)


class Artifact:
    """A deserialized exported model: `art(clips[, memory])` runs it.

    Thin wrapper over `jax.export.deserialize(...).call` carrying the
    sidecar metadata (calling convention, head, shapes)."""

    def __init__(self, exported, meta: Optional[dict]):
        self._exported = exported
        self.meta = meta or {}

    @property
    def head(self) -> str:
        return self.meta.get("head", "")

    def __call__(self, *args):
        return self._exported.call(*(jnp.asarray(a) for a in args))


def load_artifact(path: str) -> Artifact:
    with open(path, "rb") as f:
        exported = jax.export.deserialize(bytearray(f.read()))
    meta = None
    if os.path.exists(path + _SIDECAR):
        with open(path + _SIDECAR) as f:
            meta = json.load(f)
    return Artifact(exported, meta)
