"""REAL multi-process multi-host execution (scripts/multihost_smoke.py):
two OS processes x 4 virtual CPU devices, jax.distributed over localhost
TCP, per-host input shards, and a frame-parallel step whose gradient
all-reduce crosses processes — the executable form of SURVEY §2.2's
multi-host design."""
import socket
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).parent.parent


@pytest.mark.slow
@pytest.mark.parametrize("extra", [[], ["--stage2"]], ids=["static", "stage2"])
def test_two_process_step(extra):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"

    def proc(pid):
        return subprocess.Popen(
            [
                sys.executable,
                str(ROOT / "scripts" / "multihost_smoke.py"),
                "--coordinator", coord,
                "--num_processes", "2",
                "--process_id", str(pid),
                "--devices_per_process", "2",
                *extra,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=ROOT,
        )

    p1 = proc(1)
    p0 = proc(0)
    try:
        # generous: the suite's xdist workers contend for the 4 cores
        out0, _ = p0.communicate(timeout=540)
        out1, _ = p1.communicate(timeout=120)
    except subprocess.TimeoutExpired:
        p0.kill()
        p1.kill()
        raise
    assert p0.returncode == 0, out0[-2000:]
    assert p1.returncode == 0, out1[-2000:]
    assert "MULTIHOST OK" in out0, out0[-2000:]
