"""REAL multi-process SPMD test: 2 OS processes, jax.distributed over a
localhost coordinator, 1 CPU device each (Gloo collectives).

This is the missing piece the virtual-8-device tests can't cover: process
bring-up (`init_distributed`), cross-process all-reduce inside jit, owner-
slice extraction (`host_local_rows`/`host_local_indices`) on a non-fully-
addressable array, metric-row gather (`allgather_rows`) and the barrier —
i.e. every Accelerate/NCCL behavior the reference relies on
(base_trainer.py:22, train_diff_hand_obj.py:333-357) over the TPU-native
equivalent.  Assertions live in tests/multihost_child.py; this parent only
orchestrates and checks the reported results.
"""
import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_spmd():
    here = os.path.dirname(os.path.abspath(__file__))
    child = os.path.join(here, "multihost_child.py")
    coord = f"localhost:{_free_port()}"
    n = 2

    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # children run exactly 1 device each
    procs = [
        subprocess.Popen([sys.executable, child, coord, str(n), str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         env=env, text=True)
        for i in range(n)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out (coordinator deadlock?)")
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        results.append(json.loads(line))

    assert sorted(r["pid"] for r in results) == [0, 1]
    assert all(r["ok"] and r["procs"] == n for r in results)
