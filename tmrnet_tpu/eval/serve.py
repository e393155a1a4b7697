"""Line-delimited JSON serving protocol over the streaming engine.

The deployment loop the reference never had (its drivers are offline batch
jobs; serving here goes beyond `code/eval/python/test_*.py` capability):
a daemon that owns B compiled stream slots and speaks JSONL on stdin/stdout,
so any process — an OR gateway, a video router — can attach live streams
without knowing anything about JAX:

  in:  {"id": "or-1", "image": "/frames/or1/000123.png"}   frame this tick
       {"id": "or-1", "end": true}                          stream finished
       {"step": true}                                       run the tick
  out: {"id": "or-1", "frame": 123, "pred": 3, "valid": true}
       {"id": "or-9", "error": "no free slot"}

Slots are fixed at startup (one compiled program); streams join on their
first frame (slot reset in place via reset_streams), leave on "end", and a
stream that misses a tick simply isn't stepped (the engine's active mask
freezes its state — a dropped frame never corrupts the clip ring). Frames
for one stream must arrive in order; different streams are independent.
"""

from __future__ import annotations

import json
from typing import Callable, IO, Optional

import numpy as np


def serve_loop(engine, num_slots: int, in_f: IO[str], out_f: IO[str],
               load_frame_fn: Callable[[str], np.ndarray],
               emit_probs: bool = False,
               warmup_shape: Optional[tuple] = None,
               warmup_dtype=np.float32) -> dict:
    """Run the protocol until EOF on in_f. Returns a summary dict.

    engine: StreamingInference (possibly meshed). load_frame_fn maps the
    protocol's "image" field to one (H, W, 3) frame array.

    warmup_shape: per-frame (H, W, C) — when given, one ALL-INACTIVE step on
    blank frames runs before reading stdin, so the 3-7 minute first-compile
    cost is paid at startup instead of on the first client request; the
    active mask freezes every slot, so warmup cannot perturb stream state.
    warmup_dtype must match the wire dtype real frames will use (uint8 under
    data.device_normalize, float otherwise) or a second compile happens.
    """
    state = engine.init_state(num_slots)
    if warmup_shape is not None:
        blank_b = np.zeros((num_slots,) + tuple(warmup_shape), warmup_dtype)
        state, _, _, _ = engine.step(
            state, blank_b, active=np.zeros((num_slots,), bool))
    free = list(range(num_slots - 1, -1, -1))
    slot_of: dict = {}      # stream id -> slot
    frame_idx: dict = {}    # stream id -> frames served so far
    tick: dict = {}         # slot -> (stream id, frame array)
    blank: Optional[np.ndarray] = None
    ticks = emitted = 0

    def emit(obj):
        out_f.write(json.dumps(obj) + "\n")
        # error rows arrive between ticks: flush per row so a client waiting
        # on a join/frame response never deadlocks on the pipe buffer
        if "error" in obj:
            out_f.flush()

    def flush():
        nonlocal state, blank, ticks, emitted
        if not tick:
            return
        if blank is None:
            blank = np.zeros_like(next(iter(tick.values()))[1])
        frames = np.stack([tick[i][1] if i in tick else blank
                           for i in range(num_slots)])
        active = np.array([i in tick for i in range(num_slots)], bool)
        state, preds, probs, valid = engine.step(state, frames, active)
        preds, valid = np.asarray(preds), np.asarray(valid)
        p = np.asarray(probs) if emit_probs else None
        ticks += 1
        for slot in sorted(tick, key=lambda s: tick[s][0]):
            sid = tick[slot][0]
            row = {"id": sid, "frame": frame_idx[sid],
                   "pred": int(preds[slot]) if valid[slot] else None,
                   "valid": bool(valid[slot])}
            if p is not None:
                row["probs"] = [round(float(v), 6) for v in p[slot]]
            emit(row)
            emitted += 1
            frame_idx[sid] += 1
        tick.clear()
        out_f.flush()

    for line in in_f:
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError as e:
            emit({"error": f"bad json: {e}"})
            continue
        if obj.get("step"):
            flush()
            continue
        sid = obj.get("id")
        if sid is None:
            emit({"error": "missing id"})
            continue
        if obj.get("end"):
            slot = slot_of.pop(sid, None)
            if slot is None:
                emit({"id": sid, "error": "unknown stream"})
                continue
            frame_idx.pop(sid, None)
            tick.pop(slot, None)
            free.append(slot)
            continue
        if "image" not in obj:
            emit({"id": sid, "error": "missing image"})
            continue
        if sid not in slot_of:
            if not free:
                emit({"id": sid, "error": "no free slot"})
                continue
            slot = free.pop()
            slot_of[sid] = slot
            frame_idx[sid] = 0
            mask = np.zeros((num_slots,), bool)
            mask[slot] = True
            state = engine.reset_streams(state, mask)  # fresh stream
        slot = slot_of[sid]
        if slot in tick:
            emit({"id": sid, "error": "multiple frames in one tick"})
            continue
        try:
            tick[slot] = (sid, load_frame_fn(obj["image"]))
        except Exception as e:  # decode failure: skip frame, keep stream
            emit({"id": sid, "error": f"decode failed: {e}"})
    flush()  # trailing frames without a final step line
    return {"ticks": ticks, "rows": emitted,
            "live_streams": len(slot_of), "slots": num_slots}
