"""Multi-process dp axis: 2 jax.distributed CPU processes running the
sharded GVI loop over a global (dp=2, fp=4) mesh (SURVEY.md section 5.8 —
capability the reference does not have).

Spawns real subprocesses (jax.distributed cannot be re-initialized in the
test process) and checks each verified its shard of the distributed result
against the single-device loop.
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_optimize_sharded():
    port = _free_port()
    env = dict(os.environ)
    # workers set their own platform/device-count flags
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "gaussianvi_tpu.parallel.multiprocess",
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2",
                "--process-id", str(pid),
                "--cpu-devices", "4",
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            cwd=repo,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert "MULTIPROC OK" in out, f"process {pid} output:\n{out}"
        assert "devices=8" in out, out
