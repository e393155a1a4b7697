"""Multi-HOST (multi-controller) integration: two real processes, one mesh.

Everything else in the suite validates SPMD on a single-process virtual
mesh; this spawns TWO OS processes that each host 4 virtual CPU devices,
rendezvous through `jax.distributed.initialize` (the `mesh.multihost` /
DCN path, parallel/mesh.py::initialize_multihost), and run one full
stage-2 train step over the global dp=4 x tp=2 mesh — the collectives
cross the process boundary over the same multi-controller runtime a TPU
pod uses. The loss must match the single-process 8-device dryrun bit for
bit (same config, same seeds: __graft_entry__.dryrun_multichip(8)).

The reference has no multi-node story at all (SURVEY.md §2.8: one-process
torch DataParallel); this is the rebuild's DCN evidence.
"""

import os
import re
import socket
import subprocess
import sys

_SCRIPT = os.path.join(os.path.dirname(__file__), os.pardir, "scripts",
                       "multihost_dryrun.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step_matches_single_process():
    port = _free_port()
    env = dict(os.environ)
    # each process bootstraps its own 4-device virtual CPU platform; the
    # parent suite's XLA_FLAGS (8 devices) must not leak through
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, _SCRIPT, "--coordinator", f"127.0.0.1:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "--local-devices", "4"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out}"

    losses = []
    for out in outs:
        m = re.search(r"mesh=\{'data': 4, 'model': 2\} loss=([0-9.]+) step=1",
                      out)
        assert m, f"missing result line:\n{out}"
        losses.append(float(m.group(1)))
    # SPMD: every controller computes the same replicated loss
    assert losses[0] == losses[1]
