"""Real multi-process jax.distributed test (VERDICT r1 item 7; SURVEY.md §5.8).

Spawns 2 OS processes x 4 virtual CPU devices each (tests/_multihost_worker.py)
and checks that the production bootstrap (initialize_multihost), the global
('data','expert') mesh, a cross-process all-reduce, and the non-addressable
checkpoint guard all behave on a genuinely multi-process job — not just the
single-process no-op path.
"""
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_multihost_worker.py")
NUM_PROC = 2


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_four_device_job(tmp_path):
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    # Workers set their own XLA_FLAGS/JAX_PLATFORMS; scrub the parent's
    # 8-device flag so it doesn't fight the worker's 4-device one.
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(NUM_PROC), coord,
             str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(NUM_PROC)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outputs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"

    for i in range(NUM_PROC):
        with open(tmp_path / f"ok_{i}.json") as f:
            res = json.load(f)
        assert res["devices"] == 8
        assert res["total"] == float(sum(range(32)))
