"""Multi-client TCP serving transport (eval/serve_net.JsonlTcpServer):
line merging, per-owner response routing, ownership enforcement, and
disconnect slot recovery — the network front end the reference's offline
eval drivers (`code/eval/python/test_*.py`) never had."""

import json
import socket
import threading
import time

import numpy as np

from tests.test_serve import _solo
from tests.test_streaming import HW, _cfg, _variables
from tmrnet_tpu.eval.serve import serve_loop
from tmrnet_tpu.eval.serve_net import JsonlTcpServer
from tmrnet_tpu.eval.stream import StreamingInference


class _Client:
    def __init__(self, port):
        # generous recv timeout: the first tick compiles the engine inside
        # the serve loop, and a loaded host (concurrent pytest) can push
        # that past 10 s — the assertions are order-based, not timing-based
        self.sock = socket.create_connection(("127.0.0.1", port), timeout=60)
        self.f = self.sock.makefile("r")

    def send(self, obj):
        self.sock.sendall((json.dumps(obj) + "\n").encode())

    def recv(self):
        line = self.f.readline()
        assert line, "connection closed while expecting a row"
        return json.loads(line)

    def close(self):
        # shutdown, not just close: makefile() holds an io ref that would
        # otherwise keep the OS socket open and never send FIN
        self.sock.shutdown(socket.SHUT_RDWR)
        self.f.close()
        self.sock.close()


def _start(engine, server, frames, slots=2):
    res = {}

    def go():
        res["summary"] = serve_loop(
            engine, slots, server.lines(), server,
            lambda key: frames[key], decode_workers=0)

    th = threading.Thread(target=go, name="serve-loop")
    th.start()
    return th, res


def test_tcp_two_clients_route_isolate_and_recover_slots():
    """Two clients drive one stream each through a 2-slot daemon: every row
    routes to the connection that owns the stream and matches the solo
    engine run; an ownership violation errors to the OFFENDER; a dropped
    connection frees its slot (with a pending frame in the tick) for a new
    stream to claim."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=9)
    engine = StreamingInference(cfg, variables, extractor)

    n = 4
    rng = np.random.RandomState(21)
    vids = {k: rng.rand(n, HW, HW, 3).astype(np.float32) for k in "abc"}
    ref = {k: _solo(engine, v) for k, v in vids.items()}
    frames = {f"{k}{t}": vids[k][t] for k in vids for t in range(n)}

    server = JsonlTcpServer("127.0.0.1", 0)
    th, res = _start(engine, server, frames, slots=2)
    try:
        c1, c2 = _Client(server.port), _Client(server.port)

        # alternating ticks, one stream per client. Each tick is driven by
        # ONE connection (frame + step), because only per-connection line
        # order is guaranteed — the other client's stream freezes that
        # tick, which per-stream state makes equivalent to its solo run.
        for t in range(2):
            c1.send({"id": "a", "image": f"a{t}"})
            c1.send({"step": True})
            r1 = c1.recv()
            assert (r1["id"], r1["frame"]) == ("a", t)
            assert r1["valid"] == ref["a"][t][1]
            c2.send({"id": "b", "image": f"b{t}"})
            c2.send({"step": True})
            r2 = c2.recv()
            assert (r2["id"], r2["frame"]) == ("b", t)
            assert r2["pred"] == (ref["b"][t][0] if ref["b"][t][1] else None)

        # c2 pokes c1's stream: the error goes to c2, and c1's stream state
        # is untouched (its next row still matches the solo run)
        c2.send({"id": "a", "image": "a2"})
        err = c2.recv()
        assert "owned by another client" in err["error"]
        c1.send({"id": "a", "image": "a2"})
        c1.send({"step": True})
        r = c1.recv()
        assert (r["id"], r["frame"]) == ("a", 2)
        assert r["valid"] == ref["a"][2][1]

        # c2 drops its connection with a frame PENDING in the tick: the
        # disconnect must end stream b (dropping the pending frame) and
        # free the slot for c1's new stream
        c2.send({"id": "b", "image": "b2"})
        c2.close()
        deadline = time.monotonic() + 30  # loaded-host patience (flaked at 5)
        while True:    # join retries until the Disconnect frees the slot
            c1.send({"id": "c", "image": "c0"})
            c1.send({"step": True})
            row = c1.recv()
            if "error" not in row:
                break
            assert "no free slot" in row["error"]
            assert time.monotonic() < deadline, "slot never freed"
            time.sleep(0.05)
        # the join tick also stepped stream a? no — a had no pending frame,
        # so the first success row is c frame 0
        assert (row["id"], row["frame"]) == ("c", 0)
        assert row["valid"] == ref["c"][0][1]
        # c1 stays CONNECTED through stop(): closing it here raced the
        # shutdown summary — its disconnect ends streams a AND c, and under
        # host load the server processed it first (live_streams read 0)
    finally:
        server.stop()
        th.join(timeout=30)
        try:
            c1.close()
        except Exception:
            pass
    assert not th.is_alive()
    summary = res["summary"]
    # a0,b0,a1,b1,a2,c0 — b2 was pending at the disconnect and dropped
    assert summary["rows"] == 6
    # stream b ended by disconnect, a and c still live at shutdown
    assert summary["live_streams"] == 2


def test_tcp_restored_stream_reclaimed_by_new_connection(tmp_path):
    """A checkpointed stream belongs to no connection after a daemon
    restart; the first client to send its next frame claims it and resumes
    mid-video (ring intact), matching the solo run."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=10)
    engine = StreamingInference(cfg, variables, extractor)

    n = 6
    video = np.random.RandomState(31).rand(n, HW, HW, 3).astype(np.float32)
    ref = _solo(engine, video)
    frames = {f"v{t}": video[t] for t in range(n)}
    state_dir = str(tmp_path / "state")

    # run 1: stdin mode writes the checkpoint (checkpoint on exit)
    import io

    lines = []
    for t in range(3):
        lines.append({"id": "v", "image": f"v{t}"})
        lines.append({"step": True})
    in_f = io.StringIO("".join(json.dumps(o) + "\n" for o in lines))
    serve_loop(engine, 2, in_f, io.StringIO(), lambda k: frames[k],
               state_dir=state_dir, decode_workers=0)

    # run 2: TCP mode restores it; a fresh connection reclaims stream v
    server = JsonlTcpServer("127.0.0.1", 0)
    res = {}

    def go():
        res["summary"] = serve_loop(
            engine, 2, server.lines(), server, lambda k: frames[k],
            state_dir=state_dir, decode_workers=0)

    th = threading.Thread(target=go)
    th.start()
    try:
        c = _Client(server.port)
        for t in range(3, n):
            c.send({"id": "v", "image": f"v{t}"})
            c.send({"step": True})
            row = c.recv()
            assert (row["id"], row["frame"]) == ("v", t)
            assert row["valid"] == ref[t][1]
            assert row["pred"] == (ref[t][0] if ref[t][1] else None)
        c.close()
    finally:
        server.stop()
        th.join(timeout=30)
    assert res["summary"]["resumed_at_tick"] == 3


def test_tcp_oversize_line_disconnects_offender_only():
    """A client streaming an over-long line (no newline) is told off and
    disconnected — its streams' slots free up — while other clients keep
    serving untouched."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=12)
    engine = StreamingInference(cfg, variables, extractor)
    video = np.random.RandomState(41).rand(4, HW, HW, 3).astype(np.float32)
    frames = {f"v{t}": video[t] for t in range(4)}

    server = JsonlTcpServer("127.0.0.1", 0, max_line=4096)
    th, res = _start(engine, server, frames, slots=1)
    try:
        bad, good = _Client(server.port), _Client(server.port)
        # bad joins a stream first (occupies the only slot)...
        bad.send({"id": "x", "image": "v0"})
        bad.send({"step": True})
        assert bad.recv()["frame"] == 0
        # ...then violates the protocol with an endless line
        bad.sock.sendall(b"a" * 10000)
        err = bad.recv()
        assert "exceeds" in err["error"]
        assert bad.f.readline() == ""    # connection closed on us

        # the freed slot serves the well-behaved client
        deadline = time.monotonic() + 30  # loaded-host patience (flaked at 5)
        while True:
            good.send({"id": "y", "image": "v1"})
            good.send({"step": True})
            row = good.recv()
            if "error" not in row:
                break
            assert "no free slot" in row["error"]
            assert time.monotonic() < deadline, "slot never freed"
            time.sleep(0.05)
        assert (row["id"], row["frame"]) == ("y", 0)
        good.close()
    finally:
        server.stop()
        th.join(timeout=30)
    assert not th.is_alive()


def test_tcp_server_stop_unblocks_idle_loop():
    """stop() must end lines() promptly even with no clients ever
    connected — the daemon's clean-shutdown path."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=11)
    engine = StreamingInference(cfg, variables, extractor)
    server = JsonlTcpServer("127.0.0.1", 0)
    th, res = _start(engine, server, {}, slots=1)
    time.sleep(0.2)
    server.stop()
    th.join(timeout=10)
    assert not th.is_alive()
    assert res["summary"]["rows"] == 0

def test_tcp_server_stop_never_blocks_on_full_queue():
    """stop() runs on the protocol-loop thread when invoked from a signal
    handler; with the pending-line queue FULL its shutdown sentinel must be
    best-effort (put_nowait), or the handler deadlocks the consumer it is
    waiting on."""
    server = JsonlTcpServer("127.0.0.1", 0, max_pending=2)
    server._q.put((1, '{"x": 1}\n'))
    server._q.put((1, '{"x": 2}\n'))    # queue now at maxsize
    t0 = time.monotonic()
    server.stop()                        # must return immediately
    assert time.monotonic() - t0 < 1.0
    # the queued lines still drain, then lines() exits via the _stop event
    got = list(server.lines())
    assert [json.loads(l)["x"] for _, l in got] == [1, 2]


def test_tcp_slow_consumer_disconnected_not_stalling():
    """A client that stops READING fills its socket buffers; sendall must
    time out and disconnect it (freeing its slot) instead of blocking the
    protocol thread forever and stalling every other stream."""
    cfg = _cfg()
    variables, extractor = _variables(cfg, key=11)
    engine = StreamingInference(cfg, variables, extractor)

    rng = np.random.RandomState(31)
    frames = {f"x{t}": rng.rand(HW, HW, 3).astype(np.float32)
              for t in range(4)}

    # tiny kernel buffers + short send timeout so the test fills them fast
    server = JsonlTcpServer("127.0.0.1", 0, send_timeout=0.5,
                            so_sndbuf=2048)
    th, res = _start(engine, server, frames, slots=1)
    try:
        slow = socket.socket()
        slow.setsockopt(socket.SOL_SOCKET, socket.SO_RCVBUF, 2048)
        slow.connect(("127.0.0.1", server.port))
        # flood ticks, never read a single response row
        payload = b""
        for t in range(600):
            payload += (json.dumps(
                {"id": "a", "image": f"x{t % 4}"}) + "\n").encode()
            payload += b'{"step": true}\n'
        slow.sendall(payload)

        # the daemon must disconnect the slow consumer and free its slot:
        # a new client can then claim it (slots=1 makes this decisive)
        deadline = time.time() + 60
        ok = False
        while time.time() < deadline and not ok:
            c2 = _Client(server.port)
            c2.send({"id": "b", "image": "x0"})
            c2.send({"step": True})
            row = c2.recv()
            if row.get("id") == "b" and "error" not in row:
                ok = True
            c2.close()
            if not ok:
                time.sleep(0.5)
        assert ok, "slot never freed: slow consumer was not disconnected"
        slow.close()
    finally:
        server.stop()
        th.join(timeout=30)
    assert not th.is_alive()


def test_tcp_soak_sustained_churn_stays_correct_and_leak_free():
    """Soak: four connections drive ~40 full stream lives (join -> every
    frame -> clean end) through one daemon, with a hard mid-life client
    disconnect (pending frame in the tick) every 8th life. Every routed row
    must match the solo-engine oracle for that life's frame position — slot
    recycling and per-life frame numbering cannot drift over sustained
    churn — and afterwards the process is back at its fd/thread footprint
    (no leaked sockets, reader threads, or decode workers). Sustained-load
    counterpart of the protocol fuzz (tests/test_serve_fuzz.py); the
    reference's eval drivers (`code/eval/python/test_*.py`) have no serving
    surface to soak."""
    import os

    def fd_count():
        return len(os.listdir("/proc/self/fd"))

    cfg = _cfg()
    variables, extractor = _variables(cfg, key=17)
    engine = StreamingInference(cfg, variables, extractor)

    n = 8
    rng = np.random.RandomState(47)
    vids = {k: rng.rand(n, HW, HW, 3).astype(np.float32) for k in "abc"}
    ref = {k: _solo(engine, v) for k, v in vids.items()}
    frames = {f"{k}{t}": vids[k][t] for k in vids for t in range(n)}

    fd_base = fd_count()
    thread_base = threading.active_count()

    server = JsonlTcpServer("127.0.0.1", 0)
    # decode_workers=2 soaks the decode pool alongside the transport
    res = {}

    def go():
        res["summary"] = serve_loop(
            engine, 4, server.lines(), server,
            lambda key: frames[key], decode_workers=2)

    th = threading.Thread(target=go, name="serve-loop-soak")
    th.start()
    clients = None
    received = 0
    try:
        clients = [_Client(server.port) for _ in range(4)]
        for gen in range(40):
            c = clients[gen % len(clients)]
            sid = "abc"[gen % 3]
            oracle = ref[sid]
            churn = gen % 8 == 5
            steps = 4 if churn else n

            # (re)join can race a previous life's teardown: a disconnect
            # from the churned client or a clean end may not have been
            # processed yet, so retry on ownership/slot errors
            deadline = time.monotonic() + 60
            while True:
                c.send({"id": sid, "image": f"{sid}0"})
                c.send({"step": True})
                row = c.recv()
                if "error" not in row:
                    break
                assert ("owned by another client" in row["error"]
                        or "no free slot" in row["error"]), row
                assert time.monotonic() < deadline, "slot never freed"
                time.sleep(0.05)
            assert (row["id"], row["frame"]) == (sid, 0)
            assert row["valid"] == oracle[0][1]
            assert row["pred"] == (oracle[0][0] if oracle[0][1] else None)
            received += 1

            for t in range(1, steps):
                c.send({"id": sid, "image": f"{sid}{t}"})
                c.send({"step": True})
                row = c.recv()
                assert (row["id"], row["frame"]) == (sid, t)
                assert row["valid"] == oracle[t][1]
                assert row["pred"] == (
                    oracle[t][0] if oracle[t][1] else None)
                received += 1

            if churn:
                # leave a frame PENDING and drop the connection: the
                # Disconnect must drop the frame and free the slot
                c.send({"id": sid, "image": f"{sid}{steps}"})
                c.close()
                clients[gen % len(clients)] = _Client(server.port)
            else:
                c.send({"id": sid, "end": True})
    finally:
        server.stop()
        th.join(timeout=60)
        for c in clients or []:
            try:
                c.close()
            except Exception:
                pass
    assert not th.is_alive()
    summary = res["summary"]
    # every row the daemon emitted reached a client and matched the oracle
    assert summary["rows"] == received
    # every life ended (cleanly or by disconnect) before shutdown
    assert summary["live_streams"] == 0
    # no leaked sockets / reader threads / decode workers: footprint
    # returns to baseline (reader threads unwind asynchronously)
    deadline = time.monotonic() + 30
    while (threading.active_count() > thread_base
           and time.monotonic() < deadline):
        time.sleep(0.1)
    assert threading.active_count() <= thread_base + 1
    assert fd_count() <= fd_base + 2
