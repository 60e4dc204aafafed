"""Two coordinated CPU processes exercise the multi-host path end to end
(SURVEY §5.8): jax.distributed.initialize, a global mesh spanning both
processes, cross-host row-sharded rendering, frame allgather, and a train
step whose gradient psum crosses the process boundary."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_render_and_train():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(pid)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for pid in range(2)
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
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][0]
        kv = dict(part.split("=") for part in line.split()[1:])
        results[kv["pid"]] = kv
    # both processes see the identical global loss (psum across hosts)
    assert results["0"]["loss"] == results["1"]["loss"]
    # and the full assembled framebuffer
    assert results["0"]["rows"] == results["1"]["rows"] == "8"
