"""Differential soak test of serve_loop's multi-client protocol.

A seeded random schedule of joins, frames, ends, cross-client offenses,
oversubscription, disconnects, and idle evictions is run through the real
serve_loop (tiny engine) AND through an independent simulator written from
the protocol spec (eval/serve.py docstring). Every emitted row — content,
order, and destination client — must match, and every stepped frame's
pred/valid must equal the solo-engine oracle for that stream position.

This pins the full bookkeeping surface (slot recycling, ownership routing,
idle eviction, per-life frame numbering) against regressions: the protocol
is deterministic end to end, including intra-tick row order (sorted by
stream id) and eviction order (join order)."""

import json

import numpy as np

from tests.test_serve import _solo
from tests.test_streaming import HW, _cfg, _variables
from tmrnet_tpu.eval.serve import Disconnect, serve_loop
from tmrnet_tpu.eval.stream import StreamingInference

IDLE_TICKS = 4
SLOTS = 3
VIDEO_LEN = 8
STREAMS = [f"s{i}" for i in range(6)]
CLIENTS = list(range(5))


class _Sink:
    """out_f with send(): records (dest, row) in emission order."""

    def __init__(self):
        self.rows = []

    def send(self, text, cid):
        self.rows.append((cid, json.loads(text)))

    def write(self, text):  # id-less fallback: record with dest=None
        self.rows.append((None, json.loads(text)))

    def flush(self):
        pass


class _Sim:
    """Independent transliteration of the PROTOCOL SPEC (serve.py
    docstring): slots, ownership, idle eviction, per-life frame numbering.
    oracle[sid] = [(pred, valid), ...] from the solo engine run."""

    def __init__(self, num_slots, oracle, idle_ticks):
        self.free = num_slots
        self.slot_of = {}      # sid -> True, in JOIN ORDER (dict semantics)
        self.owner = {}
        self.frame_idx = {}
        self.last_seen = {}
        self.pending = {}      # sid -> frame position to step this tick
        self.ticks = 0
        self.oracle = oracle
        self.idle_ticks = idle_ticks
        self.expected = []     # [(dest, row-dict)]

    def line(self, cid, obj):
        if obj.get("step"):
            self.flush()
            return
        sid = obj["id"]
        if sid in self.owner and self.owner[sid] != cid:
            self.expected.append(
                (cid, {"id": sid, "error": "stream owned by another client"}))
            return
        if obj.get("end"):
            if not self._end(sid):
                self.expected.append(
                    (self.owner.get(sid, cid), {"id": sid,
                                                "error": "unknown stream"}))
            return
        if sid not in self.slot_of:
            if self.free == 0:
                self.expected.append(
                    (cid, {"id": sid, "error": "no free slot"}))
                return
            self.free -= 1
            self.slot_of[sid] = True
            self.frame_idx[sid] = 0
            self.last_seen[sid] = self.ticks
        self.owner[sid] = cid
        if sid in self.pending:
            self.expected.append(
                (cid, {"id": sid, "error": "multiple frames in one tick"}))
            return
        self.pending[sid] = self.frame_idx[sid]

    def disconnect(self, cid):
        for sid in [s for s, c in self.owner.items() if c == cid]:
            self._end(sid)

    def _end(self, sid):
        self.owner.pop(sid, None)
        self.last_seen.pop(sid, None)
        if self.slot_of.pop(sid, None) is None:
            return False
        self.frame_idx.pop(sid, None)
        self.pending.pop(sid, None)
        self.free += 1
        return True

    def flush(self):
        if not self.pending:
            return
        self.ticks += 1
        for sid in sorted(self.pending):   # intra-tick order: by stream id
            t = self.pending[sid]
            pred, valid = self.oracle[sid][t]
            self.expected.append(
                (self.owner[sid], {"id": sid, "frame": t,
                                   "pred": pred if valid else None,
                                   "valid": valid}))
            self.frame_idx[sid] = t + 1
            self.last_seen[sid] = self.ticks
        self.pending.clear()
        for sid in [s for s in self.slot_of   # eviction order: join order
                    if self.ticks - self.last_seen[s] >= self.idle_ticks]:
            self.expected.append(
                (self.owner[sid],
                 {"id": sid, "evicted": True,
                  "error": f"idle for {self.idle_ticks} ticks: slot "
                           f"reclaimed (rejoin starts fresh)"}))
            self._end(sid)


def test_serve_loop_multiclient_random_schedule_matches_spec():
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=11)
    engine = StreamingInference(cfg, variables, extractor)

    rng = np.random.RandomState(1234)
    vids = {s: rng.rand(VIDEO_LEN, HW, HW, 3).astype(np.float32)
            for s in STREAMS}
    oracle = {s: _solo(engine, v) for s, v in vids.items()}
    frames = {f"{s}:{t}": vids[s][t] for s in STREAMS
              for t in range(VIDEO_LEN)}

    home = {s: CLIENTS[i % len(CLIENTS)] for i, s in enumerate(STREAMS)}
    sim = _Sim(SLOTS, oracle, IDLE_TICKS)
    gone = set()
    lines = []

    def feed(cid, obj):
        lines.append((cid, json.dumps(obj) + "\n"))
        sim.line(cid, obj)

    for rnd in range(60):
        if rnd == 30:          # client 3 drops; its streams end silently
            lines.append((3, Disconnect()))
            sim.disconnect(3)
            gone.add(3)
        for s in STREAMS:
            cid = home[s]
            if cid in gone:
                continue
            r = rng.rand()
            # next frame for the CURRENT life: what the sim would step next
            t = sim.pending.get(s, sim.frame_idx.get(s, 0))
            if r < 0.55 and t < VIDEO_LEN:
                feed(cid, {"id": s, "image": f"{s}:{t}"})
            elif r < 0.62 and t < VIDEO_LEN:   # double frame in one tick
                feed(cid, {"id": s, "image": f"{s}:{t}"})
                feed(cid, {"id": s, "image": f"{s}:{t}"})
            elif r < 0.70:
                feed(cid, {"id": s, "end": True})
            elif r < 0.76:                     # cross-client offense
                other = CLIENTS[(cid + 1) % len(CLIENTS)]
                if other not in gone:
                    feed(other, {"id": s, "image": f"{s}:{t}"})
        if rng.rand() < 0.08:                  # end for an unknown stream
            feed(0, {"id": "ghost", "end": True})
        if rng.rand() < 0.85:                  # occasional missing step:
            feed(0, {"step": True})            # frames carry across rounds
    feed(0, {"step": True})
    sim.flush()   # EOF flush (serve_loop flushes trailing frames too)

    out = _Sink()
    summary = serve_loop(engine, SLOTS, iter(lines), out,
                         lambda key: frames[key], idle_ticks=IDLE_TICKS)

    assert len(out.rows) == len(sim.expected), (
        f"row count {len(out.rows)} != expected {len(sim.expected)}")
    for i, ((gc, gr), (ec, er)) in enumerate(zip(out.rows, sim.expected)):
        assert gc == ec, f"row {i}: dest {gc} != {ec} ({gr} vs {er})"
        for k, v in er.items():
            assert gr.get(k) == v, f"row {i}: {k}={gr.get(k)!r} != {v!r}"
    assert summary["live_streams"] == len(sim.slot_of)
    assert summary["evicted"] == sum(
        1 for _, r in sim.expected if r.get("evicted"))
    # the soak must actually exercise every path
    texts = [r.get("error", "") for _, r in sim.expected]
    assert any("owned by another" in t for t in texts)
    assert any("multiple frames" in t for t in texts)
    assert any("unknown stream" in t for t in texts)
    assert any(r.get("evicted") for _, r in sim.expected)
    assert sum(1 for _, r in sim.expected if "frame" in r) > 100
