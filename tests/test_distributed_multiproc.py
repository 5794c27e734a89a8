"""Two-process jax.distributed smoke (VERDICT r2 weak #6): the §2.6
multi-host claim, actually run with >1 process. Spawns two CPU worker
processes that initialize one distributed runtime, psum across processes
over a global mesh, fan out host-0 state, and restore a proc-0 checkpoint
on both. Everything else in parallel/distributed.py stays unit-tested
single-process; this covers the genuinely multi-process seams."""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = os.path.join(os.path.dirname(__file__), "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_psum_and_checkpoint(tmp_path):
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker sets its own device count
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, coord, "2", str(pid), str(tmp_path)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            cwd=repo_root,
        )
        for pid in (0, 1)
    ]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=240)
        assert p.returncode == 0, err.decode()[-2000:]
        line = out.decode().strip().splitlines()[-1]
        r = json.loads(line)
        results[r["pid"]] = r

    assert set(results) == {0, 1}
    for pid, r in results.items():
        assert r["process_count"] == 2
        assert r["device_count"] == 4  # 2 virtual CPU devices x 2 processes
        # psum over the global mesh: 2*(1) + 2*(2) = 6 on every process
        assert r["psum"] == 6.0, r
        # host-0 broadcast reached both processes
        assert r["bcast_w"] == [0.0, 3.0, 6.0, 9.0]
        assert r["bcast_step"] == 7
        # proc-0's checkpoint restored on this process
        assert r["restored_ok"]
