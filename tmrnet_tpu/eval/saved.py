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
        "jax_version": jax.__version__,
        "config": dataclasses.asdict(cfg),
    }
    return exported.serialize(), meta


def export_stream(cfg, variables, extractor_variables, num_slots: int,
                  platforms: Sequence[str] = ("cpu", "tpu")
                  ) -> Tuple[bytes, dict]:
    """Lower + serialize the streaming SERVE step (eval/stream.py) for a
    fixed slot count: per-tick state rings in/out, new frames + active mask
    in, (preds, probs, valid) out — both trunks, both LSTMs, the memory
    head and the ring updates in one program, weights baked in. With this
    artifact the `serve` daemon runs with NO model code or checkpoints
    (`serve --artifact model.bin`); `ArtifactStreamEngine` adapts it to
    serve_loop's engine interface (init/reset are weight-free host ops).

    The slot count is baked in (serving slots are the compiled batch);
    export one artifact per deployed slot count. Single-device: mesh
    sharding is not captured by the artifact."""
    from tmrnet_tpu.eval.stream import StreamingInference, StreamState

    eng = StreamingInference(cfg, variables, extractor_variables)
    b = int(num_slots)
    crop = int(cfg.data.crop_size)
    wire = jnp.uint8 if cfg.data.device_normalize else jnp.float32
    cdt = eng.cdt

    def fn(ext_ring, tmr_ring, bank_ring, count, frames, active):
        st = StreamState(ext_ring, tmr_ring, bank_ring, count)
        new, preds, probs, valid = eng._step_impl(st, frames, active)
        return ((new.ext_ring, new.tmr_ring, new.bank_ring, new.count),
                preds, probs, valid)

    specs = (
        jax.ShapeDtypeStruct((b, eng.seq, eng.feature_dim), cdt),
        jax.ShapeDtypeStruct((b, eng.seq, eng.feature_dim), cdt),
        jax.ShapeDtypeStruct((b, eng.window, eng.hidden), cdt),
        jax.ShapeDtypeStruct((b,), jnp.int32),
        jax.ShapeDtypeStruct((b, crop, crop, 3), wire),
        jax.ShapeDtypeStruct((b,), jnp.bool_),
    )
    exported = jax.export.export(jax.jit(fn),
                                 platforms=list(platforms))(*specs)
    meta = {
        "kind": "stream",
        "slots": b,
        "seq": int(eng.seq),
        "window": int(eng.window),
        "hidden": int(eng.hidden),
        "feature_dim": int(eng.feature_dim),
        "compute_dtype": str(np.dtype(cdt)),
        "num_classes": int(cfg.model.num_classes),
        "platforms": list(platforms),
        "inputs": [{"shape": list(s.shape), "dtype": str(np.dtype(s.dtype))}
                   for s in specs],
        "wire": ("uint8+device-normalize" if wire == jnp.uint8
                 else "float32 pre-normalized"),
        "jax_version": jax.__version__,
        "config": dataclasses.asdict(cfg),
    }
    return exported.serialize(), meta


class ArtifactStreamEngine:
    """serve_loop-compatible engine over an `export_stream` artifact.

    step() runs the artifact; init_state/reset_streams are weight-free
    host-side ring ops, so the whole daemon needs only JAX + the artifact.
    Single device (no mesh); the slot count is baked into the artifact."""

    def __init__(self, artifact: "Artifact"):
        m = artifact.meta
        if m.get("kind") != "stream":
            raise ValueError(
                "not a stream artifact (export with `export-model "
                f"--stream`); sidecar kind={m.get('kind')!r}")
        self._art = artifact
        self.meta = m
        self.slots = int(m["slots"])
        self.seq = int(m["seq"])
        self.window = int(m["window"])
        self.hidden = int(m["hidden"])
        self.feature_dim = int(m["feature_dim"])
        self.cdt = jnp.dtype(m["compute_dtype"])
        self._bsh = None   # no mesh: serve_loop checkpoints need this attr

    def init_state(self, num_streams: int):
        from tmrnet_tpu.eval.stream import StreamState

        if int(num_streams) != self.slots:
            raise ValueError(f"artifact was exported with {self.slots} "
                             f"slots (asked for {num_streams}); re-export "
                             "for a different slot count")
        b = self.slots
        return StreamState(
            ext_ring=jnp.zeros((b, self.seq, self.feature_dim), self.cdt),
            tmr_ring=jnp.zeros((b, self.seq, self.feature_dim), self.cdt),
            bank_ring=jnp.zeros((b, self.window, self.hidden), self.cdt),
            count=jnp.zeros((b,), jnp.int32))

    def reset_streams(self, state, mask):
        from tmrnet_tpu.eval.stream import StreamState

        mask = jnp.asarray(np.asarray(mask, bool))

        def z(ring):
            return jnp.where(mask[:, None, None], jnp.zeros_like(ring), ring)

        return StreamState(
            ext_ring=z(state.ext_ring), tmr_ring=z(state.tmr_ring),
            bank_ring=z(state.bank_ring),
            count=jnp.where(mask, jnp.zeros_like(state.count), state.count))

    def step(self, state, frames, active=None):
        from tmrnet_tpu.eval.stream import StreamState

        if active is None:
            active = np.ones((self.slots,), bool)
        (e, t, bk, c), preds, probs, valid = self._art(
            state.ext_ring, state.tmr_ring, state.bank_ring, state.count,
            frames, np.asarray(active, bool))
        return StreamState(e, t, bk, c), preds, probs, valid


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
