"""Serving daemon protocol (eval/serve.serve_loop): JSONL in -> JSONL out,
dynamic join/leave on fixed compiled slots, parity with solo engine runs."""

import io
import json

import numpy as np

from tests.test_streaming import HW, _cfg, _variables
from tmrnet_tpu.eval.serve import serve_loop
from tmrnet_tpu.eval.stream import StreamingInference


def _solo(stream, video):
    out, st = [], stream.init_state(1)
    for t in range(len(video)):
        st, p, _, v = stream.step(st, video[t][None])
        out.append((int(p[0]), bool(v[0])))
    return out


def _protocol(lines):
    return io.StringIO("".join(json.dumps(o) + "\n" for o in lines))


def test_serve_loop_join_leave_recycle():
    """Three streams through two slots: a and b join; a ends mid-run; c joins
    (recycles a's slot). Every emitted row must match the stream's solo run,
    and oversubscription must produce an error row, not a crash."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)

    n = 6
    rng = np.random.RandomState(8)
    vids = {k: rng.rand(n, HW, HW, 3).astype(np.float32) for k in "abc"}
    ref = {k: _solo(engine, v) for k, v in vids.items()}

    frames = {f"{k}{t}": vids[k][t] for k in vids for t in range(n)}
    load = lambda key: frames[key]

    lines = []
    # phase 1: a and b run 4 ticks together; d oversubscribes on tick 0
    for t in range(4):
        lines.append({"id": "a", "image": f"a{t}"})
        lines.append({"id": "b", "image": f"b{t}"})
        if t == 0:
            lines.append({"id": "d", "image": "a0"})
        lines.append({"step": True})
    # a ends; c takes its slot while b keeps going
    lines.append({"id": "a", "end": True})
    for t in range(2):
        lines.append({"id": "c", "image": f"c{t}"})
        lines.append({"id": "b", "image": f"b{4 + t}"})
        lines.append({"step": True})
    # b ends; c finishes alone; the last tick has no step line and must be
    # flushed at EOF
    lines.append({"id": "b", "end": True})
    for t in range(2, n):
        lines.append({"id": "c", "image": f"c{t}"})
        if t < n - 1:
            lines.append({"step": True})

    out = io.StringIO()
    summary = serve_loop(engine, 2, _protocol(lines), out, load)

    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    errors = [r for r in rows if "error" in r]
    assert [e["id"] for e in errors] == ["d"]
    assert "no free slot" in errors[0]["error"]

    got = {}
    for r in rows:
        if "error" in r:
            continue
        got.setdefault(r["id"], []).append(r)
    for k in "abc":
        served = {"a": 4, "b": 6, "c": 6}[k]
        krows = got[k]
        assert [r["frame"] for r in krows] == list(range(served))
        for r in krows:
            pred, valid = ref[k][r["frame"]]
            assert r["valid"] == valid
            assert r["pred"] == (pred if valid else None)
    assert summary["rows"] == 4 + 6 + 6
    assert summary["live_streams"] == 1  # c never sent "end"
    assert summary["slots"] == 2


def test_serve_loop_warmup_does_not_perturb_streams():
    """The startup warmup step (all-inactive, blank frames) must leave every
    subsequent row identical to a run without warmup."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)

    n = 6
    va = np.random.RandomState(2).rand(n, HW, HW, 3).astype(np.float32)
    frames = {f"a{t}": va[t] for t in range(n)}
    lines = []
    for t in range(n):
        lines.append({"id": "a", "image": f"a{t}"})
        lines.append({"step": True})

    outs = []
    for shape in (None, (HW, HW, 3)):
        out = io.StringIO()
        serve_loop(engine, 2, _protocol(lines), out, lambda k: frames[k],
                   warmup_shape=shape)
        outs.append(out.getvalue())
    assert outs[0] == outs[1]


def test_serve_loop_state_checkpoint_resume(tmp_path):
    """Crash recovery: a daemon killed mid-run and restarted with the same
    --state-dir resumes every live stream mid-video — the concatenated rows
    of the two runs must equal one uninterrupted run (bf16 state round-trips
    through f32 losslessly; this config is f32 so equality is exact)."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)

    n = 8
    rng = np.random.RandomState(5)
    vids = {k: rng.rand(n, HW, HW, 3).astype(np.float32) for k in "ab"}
    frames = {f"{k}{t}": vids[k][t] for k in vids for t in range(n)}
    load = lambda key: frames[key]

    def tick_lines(ts):
        lines = []
        for t in ts:
            lines.append({"id": "a", "image": f"a{t}"})
            lines.append({"id": "b", "image": f"b{t}"})
            lines.append({"step": True})
        return lines

    # uninterrupted reference
    engine = StreamingInference(cfg, variables, extractor)
    ref_out = io.StringIO()
    serve_loop(engine, 2, _protocol(tick_lines(range(n))), ref_out, load)

    # run 1: first 5 ticks, checkpoint every tick; "crash" = EOF
    sdir = str(tmp_path / "serving-state")
    out1 = io.StringIO()
    serve_loop(StreamingInference(cfg, variables, extractor), 2,
               _protocol(tick_lines(range(5))), out1, load,
               state_dir=sdir, checkpoint_every=1)
    # run 2: fresh engine + restore, remaining ticks
    out2 = io.StringIO()
    summary = serve_loop(StreamingInference(cfg, variables, extractor), 2,
                         _protocol(tick_lines(range(5, n))), out2, load,
                         state_dir=sdir)
    assert summary["resumed_at_tick"] == 5
    assert out1.getvalue() + out2.getvalue() == ref_out.getvalue()


def test_serve_loop_dropped_tick_and_errors():
    """A stream that misses a tick is not stepped (state frozen); malformed
    lines produce error rows; probs are emitted when requested."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)

    n = 5
    rng = np.random.RandomState(12)
    va = rng.rand(n, HW, HW, 3).astype(np.float32)
    vb = rng.rand(n, HW, HW, 3).astype(np.float32)
    ref_a = _solo(engine, va)

    frames = {f"a{t}": va[t] for t in range(n)}
    frames.update({f"b{t}": vb[t] for t in range(n)})

    lines = []
    ta = 0
    for tick in range(n + 2):
        if tick not in (1, 3):  # a drops ticks 1 and 3
            lines.append({"id": "a", "image": f"a{ta}"})
            ta += 1
        if tick < n:
            lines.append({"id": "b", "image": f"b{tick}"})
        if tick == 0:
            lines.append({"id": "a", "image": "a0"})     # dup in same tick
            lines.append({"no_id": True})                # missing id
            lines.append({"id": "x", "end": True})       # unknown stream
            lines.append({"id": "a"})                    # missing image
            lines.append({"id": "z", "image": "nope"})   # decode failure
        lines.append({"step": True})
    out = io.StringIO()
    serve_loop(engine, 4, _protocol(lines), out, lambda k: frames[k],
               emit_probs=True)
    rows = [json.loads(l) for l in out.getvalue().splitlines()]

    errs = [r.get("error", "") for r in rows if "error" in r]
    assert any("multiple frames" in e for e in errs)
    assert any("missing id" in e for e in errs)
    assert any("unknown stream" in e for e in errs)
    assert any("missing image" in e for e in errs)
    assert any("decode failed" in e for e in errs)

    a_rows = [r for r in rows if r.get("id") == "a" and "error" not in r]
    assert [r["frame"] for r in a_rows] == list(range(n))
    for r in a_rows:
        pred, valid = ref_a[r["frame"]]
        assert r["valid"] == valid and r["pred"] == (pred if valid else None)
        assert len(r["probs"]) == cfg.model.num_classes


def test_serve_loop_numeric_ids_and_stale_checkpoint(tmp_path):
    """Numeric JSON ids coerce to strings (so they survive the JSON-keyed
    state checkpoint), and a checkpoint from a different model config is
    discarded instead of crash-looping the recovery path."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)

    n = 5
    va = np.random.RandomState(7).rand(n, HW, HW, 3).astype(np.float32)
    frames = {f"a{t}": va[t] for t in range(n)}
    lines = []
    for t in range(n):
        lines.append({"id": 7, "image": f"a{t}"})   # numeric id
        lines.append({"step": True})

    sdir = str(tmp_path / "sd")
    out = io.StringIO()
    serve_loop(engine, 2, _protocol(lines), out, lambda k: frames[k],
               state_dir=sdir, checkpoint_every=1)
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert all(r["id"] == "7" for r in rows)
    ref = _solo(engine, va)
    assert [(r["pred"], r["valid"]) for r in rows] == \
        [(p if v else None, v) for p, v in ref]

    # a different sequence_length changes the ring shapes and must
    # invalidate the checkpoint -> fresh start, not a jit shape crash
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, sequence_length=6))
    out2 = io.StringIO()
    summary = serve_loop(StreamingInference(cfg2, variables, extractor), 2,
                         _protocol(lines), out2, lambda k: frames[k],
                         state_dir=sdir)
    assert summary["resumed_at_tick"] == 0  # stale checkpoint discarded


def test_serve_loop_checkpoints_on_abrupt_exit(tmp_path):
    """SystemExit mid-protocol (what the CLI's SIGTERM handler raises) must
    still write the state checkpoint via the finally path, and a restart
    resumes from the last completed tick."""
    import json as _json

    import pytest

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)
    va = np.random.RandomState(1).rand(3, HW, HW, 3).astype(np.float32)
    frames = {f"a{t}": va[t] for t in range(3)}

    def dying_input():
        yield _json.dumps({"id": "a", "image": "a0"}) + "\n"
        yield _json.dumps({"step": True}) + "\n"
        raise SystemExit(0)

    sdir = str(tmp_path / "sd")
    out = io.StringIO()
    with pytest.raises(SystemExit):
        serve_loop(engine, 2, dying_input(), out, lambda k: frames[k],
                   state_dir=sdir, checkpoint_every=0)
    data = np.load(sdir + "/state.npz")
    meta = json.loads(str(data["meta"]))
    assert meta["ticks"] == 1 and meta["slot_of"] == {"a": 0}

    out2 = io.StringIO()
    summary = serve_loop(StreamingInference(cfg, variables, extractor), 2,
                         _protocol([{"id": "a", "image": "a1"},
                                    {"step": True}]), out2,
                         lambda k: frames[k], state_dir=sdir)
    assert summary["resumed_at_tick"] == 1
    row = json.loads(out2.getvalue().splitlines()[0])
    assert row["frame"] == 1  # stream clock resumed, not restarted


def test_serve_loop_deferred_stop_exits_at_tick_boundary(tmp_path):
    """A stop requested while a tick is in flight (the CLI's deferred
    SIGTERM) exits AFTER the tick completes: its rows are emitted and the
    checkpoint reflects the full tick."""
    import pytest

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)
    va = np.random.RandomState(6).rand(2, HW, HW, 3).astype(np.float32)
    frames = {f"a{t}": va[t] for t in range(2)}

    guard = {"busy": False, "stop": True}  # stop already requested
    sdir = str(tmp_path / "sd")
    out = io.StringIO()
    lines = [{"id": "a", "image": "a0"}, {"step": True},
             {"id": "a", "image": "a1"}, {"step": True}]
    with pytest.raises(SystemExit):
        serve_loop(engine, 2, _protocol(lines), out, lambda k: frames[k],
                   state_dir=sdir, term_guard=guard)
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(rows) == 1 and rows[0]["frame"] == 0  # tick 1 completed
    meta = json.loads(str(np.load(sdir + "/state.npz")["meta"]))
    assert meta["ticks"] == 1 and meta["frame_idx"] == {"a": 1}


def test_serve_loop_slow_decode_dropped_not_stalling():
    """One stream with a pathologically slow decoder must not stall the
    tick past decode_timeout (VERDICT r2 #5): its frame is dropped with a
    timeout error, its LATER frames busy-drop while the stale decode still
    occupies the worker (per-stream backpressure — stale futures must not
    accumulate and starve healthy streams), every other stream's rows are
    unaffected, and the stream recovers IN the same loop once the decode
    drains (inflight release path)."""
    import time as _time

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)

    n = 4
    rng = np.random.RandomState(21)
    va = rng.rand(n, HW, HW, 3).astype(np.float32)
    vb = rng.rand(n, HW, HW, 3).astype(np.float32)
    ref_b = _solo(engine, vb)
    # a's effective video: the slow frame and the busy-dropped frame never
    # arrive, so its stream is va[2:]
    ref_a = _solo(engine, va[2:])

    frames = {f"a{t}": va[t] for t in range(n)}
    frames.update({f"b{t}": vb[t] for t in range(n)})
    SLEEP = 4.0

    def load(key):
        if key == "slow":
            _time.sleep(SLEEP)
            return va[0]
        return frames[key]

    # pre-compile the batch-2 step so the timed region measures ticks,
    # not the first-call jit
    engine.step(engine.init_state(2),
                np.zeros((2, HW, HW, 3), np.float32),
                active=np.zeros((2,), bool))

    times = {}

    def lines_gen():
        # phase 1: tick 0 = slow frame + b0; tick 1 = a1 (busy-drops while
        # the stale decode still runs) + b1
        for o in [{"id": "a", "image": "slow"}, {"id": "b", "image": "b0"},
                  {"step": True},
                  {"id": "a", "image": "a1"}, {"id": "b", "image": "b1"},
                  {"step": True}]:
            yield json.dumps(o) + "\n"
        times["phase1"] = _time.perf_counter()
        _time.sleep(SLEEP)   # let the stale decode drain INSIDE the loop
        for o in [{"id": "a", "image": "a2"}, {"id": "b", "image": "b2"},
                  {"step": True},
                  {"id": "a", "image": "a3"}, {"id": "b", "image": "b3"},
                  {"step": True}]:
            yield json.dumps(o) + "\n"

    out = io.StringIO()
    t0 = _time.perf_counter()
    serve_loop(engine, 2, lines_gen(), out, load,
               decode_workers=2, decode_timeout=0.15)
    # phase 1 never waited out the 4 s sleep (wide margin: this 1-core
    # host's load can stretch tick wall-clock — CLAUDE.md testing notes)
    elapsed = times["phase1"] - t0
    assert elapsed < 2.5, f"tick stalled on the slow decode: {elapsed:.2f}s"

    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    errs = [r for r in rows if "error" in r]
    assert [e["id"] for e in errs] == ["a", "a"]
    assert "decode timeout" in errs[0]["error"]
    assert "decode busy" in errs[1]["error"]
    # b's rows: every tick, matching its solo run exactly
    b_rows = [r for r in rows if r.get("id") == "b" and "error" not in r]
    assert [r["frame"] for r in b_rows] == list(range(n))
    for r in b_rows:
        pred, valid = ref_b[r["frame"]]
        assert r["valid"] == valid and r["pred"] == (pred if valid else None)
    # a froze ticks 0-1, then recovered in-loop and ran va[2:] as 0..1
    a_rows = [r for r in rows if r.get("id") == "a" and "error" not in r]
    assert [r["frame"] for r in a_rows] == [0, 1]
    for r in a_rows:
        pred, valid = ref_a[r["frame"]]
        assert r["valid"] == valid and r["pred"] == (pred if valid else None)


def test_serve_loop_stale_saturation_survives_rejoin_churn():
    """The per-stream backpressure is keyed by protocol id, which an
    end/rejoin cycle resets — the stale-decode cap must still refuse new
    submissions once timed-out decodes occupy every worker, so id churn
    cannot starve the pool (review r3 finding)."""
    import time as _time

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)

    def load(key):
        if key.startswith("hang"):
            _time.sleep(5.0)
        return np.zeros((HW, HW, 3), np.float32)

    # x hangs, times out, ends, rejoins under a new id, hangs again...
    lines = [{"id": "x1", "image": "hang1"}, {"step": True},
             {"id": "x1", "end": True},
             {"id": "x2", "image": "hang2"}, {"step": True},
             {"id": "x2", "end": True},
             {"id": "x3", "image": "hang3"}, {"step": True}]
    out = io.StringIO()
    t0 = _time.perf_counter()
    serve_loop(engine, 2, _protocol(lines), out, load,
               decode_workers=2, decode_timeout=0.1)
    elapsed = _time.perf_counter() - t0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    errs = [r["error"] for r in rows if "error" in r]
    assert len(errs) == 3
    assert "decode timeout" in errs[0] and "decode timeout" in errs[1]
    # the third hang is refused at submit time: both workers are already
    # occupied by stale decodes
    assert "pool saturated" in errs[2]
    assert elapsed < 4.0  # never waited on any 5 s sleep


def test_serve_loop_end_orphaned_decode_counts_as_stale():
    """Ending a stream while its decode is still RUNNING (no tick in
    between) must move the orphaned future into the stale accounting:
    otherwise end/rejoin churn occupies every worker with hung decodes the
    saturation cap never sees, and healthy streams starve behind them."""
    import threading
    import time as _time

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=3)
    engine = StreamingInference(cfg, variables, extractor)

    started = {k: threading.Event() for k in ("hang1", "hang2")}
    release = threading.Event()

    def load(key):
        if key in started:
            started[key].set()
            release.wait(10.0)
        return np.zeros((HW, HW, 3), np.float32)

    def lines():
        yield json.dumps({"id": "x1", "image": "hang1"}) + "\n"
        assert started["hang1"].wait(5.0)  # decode running on a worker
        yield json.dumps({"id": "x1", "end": True}) + "\n"
        yield json.dumps({"id": "x2", "image": "hang2"}) + "\n"
        assert started["hang2"].wait(5.0)
        yield json.dumps({"id": "x2", "end": True}) + "\n"
        yield json.dumps({"id": "x3", "image": "ok"}) + "\n"
        yield json.dumps({"step": True}) + "\n"

    out = io.StringIO()
    t0 = _time.perf_counter()
    try:
        serve_loop(engine, 2, lines(), out, load,
                   decode_workers=2, decode_timeout=0.5)
    finally:
        release.set()
    elapsed = _time.perf_counter() - t0
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    errs = [r["error"] for r in rows if "error" in r]
    # x3's frame is refused at SUBMIT time — both workers are occupied by
    # decodes orphaned by the end lines — not silently queued behind them
    # to die as a per-tick timeout
    assert len(errs) == 1 and "pool saturated" in errs[0]
    assert elapsed < 5.0  # never waited on an orphaned decode


def test_serve_loop_idle_eviction():
    """idle_ticks=2: a stream that stops sending frames is evicted after
    missing 2 consecutive ticks (one evicted-row emitted, slot freed for a
    new join); the active stream is never evicted and a rejoin of the
    evicted id starts fresh at frame 0."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=6)
    engine = StreamingInference(cfg, variables, extractor)

    n = 8
    rng = np.random.RandomState(13)
    vids = {k: rng.rand(n, HW, HW, 3).astype(np.float32) for k in "ab"}
    frames = {f"{k}{t}": vids[k][t] for k in vids for t in range(n)}
    load = lambda key: frames[key]

    lines = []
    # b sends one frame then goes silent; a keeps streaming
    lines.append({"id": "b", "image": "b0"})
    for t in range(5):
        lines.append({"id": "a", "image": f"a{t}"})
        lines.append({"step": True})
    # by tick 3 b has missed ticks 2 and 3 -> evicted; with slots=2 the
    # post-eviction join of c must succeed
    lines.append({"id": "c", "image": "a0"})
    lines.append({"id": "a", "image": "a5"})
    lines.append({"step": True})
    # and the evicted id can rejoin fresh (c ends to free its slot first:
    # a still holds the other one and keeps streaming so ITS idle clock
    # never fires)
    lines.append({"id": "c", "end": True})
    lines.append({"id": "b", "image": "b1"})
    lines.append({"id": "a", "image": "a6"})
    lines.append({"step": True})

    out = io.StringIO()
    summary = serve_loop(engine, 2, _protocol(lines), out, load,
                         decode_workers=0, idle_ticks=2)
    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    ev = [r for r in rows if r.get("evicted")]
    assert len(ev) == 1 and ev[0]["id"] == "b"
    assert summary["evicted"] == 1
    # no "no free slot" errors anywhere: the evicted slot was reclaimed
    assert not [r for r in rows if "error" in r and not r.get("evicted")]
    b_rows = [r for r in rows if r["id"] == "b" and "frame" in r]
    # b0 at frame 0, then the rejoin starts fresh at frame 0 again
    assert [r["frame"] for r in b_rows] == [0, 0]
    a_rows = [r for r in rows if r["id"] == "a" and "frame" in r]
    assert [r["frame"] for r in a_rows] == list(range(7))


def test_serve_loop_stats_heartbeat():
    """stats_every=2: one JSON heartbeat per 2 ticks lands on stats_f (not
    the protocol stream), with rolling latency and live-stream counts."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=7)
    engine = StreamingInference(cfg, variables, extractor)
    video = np.random.RandomState(17).rand(5, HW, HW, 3).astype(np.float32)
    frames = {f"v{t}": video[t] for t in range(5)}

    lines = []
    for t in range(5):
        lines.append({"id": "s", "image": f"v{t}"})
        lines.append({"step": True})
    out, stats = io.StringIO(), io.StringIO()
    serve_loop(engine, 1, _protocol(lines), out, lambda k: frames[k],
               decode_workers=0, stats_every=2, stats_f=stats)
    beats = [json.loads(l)["stats"] for l in stats.getvalue().splitlines()]
    assert [b["tick"] for b in beats] == [2, 4]
    assert all(b["live_streams"] == 1 and b["lat_ms_p50"] > 0
               for b in beats)
    # the protocol stream carries no stats lines
    assert not [l for l in out.getvalue().splitlines() if "stats" in l]


def test_serve_loop_self_ticking():
    """tick_interval > 0: frames flush on wall-clock ticks with no
    {"step": true} lines anywhere — two frames of one stream land in
    different ticks (same-tick duplicates would error), explicit EOF still
    flushes the trailing frame, and rows match the solo engine run."""
    import os
    import threading
    import time as _time

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=5)
    engine = StreamingInference(cfg, variables, extractor)

    n = 3
    video = np.random.RandomState(11).rand(n, HW, HW, 3).astype(np.float32)
    ref = _solo(engine, video)
    load = lambda key: video[int(key)]

    r_fd, w_fd = os.pipe()
    in_f = os.fdopen(r_fd, "r")

    def feed():
        with os.fdopen(w_fd, "w") as w:
            for t in range(n):
                w.write(json.dumps({"id": "s", "image": str(t)}) + "\n")
                w.flush()
                if t < n - 1:
                    _time.sleep(0.35)  # > tick_interval: frame t flushes
                # last frame rides the EOF flush

    th = threading.Thread(target=feed)
    th.start()
    out = io.StringIO()
    summary = serve_loop(engine, 1, in_f, out, load,
                         decode_workers=0, tick_interval=0.1)
    th.join()

    rows = [json.loads(l) for l in out.getvalue().splitlines()]
    assert not [r for r in rows if "error" in r]
    assert [r["frame"] for r in rows] == list(range(n))
    for r in rows:
        pred, valid = ref[r["frame"]]
        assert r["valid"] == valid
        assert r["pred"] == (pred if valid else None)
    assert summary["rows"] == n
    assert summary["ticks"] == n  # one tick per frame, none empty
