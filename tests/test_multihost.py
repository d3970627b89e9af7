"""2-process multihost validation (VERDICT r1 next-round #7): a real
jax.distributed.initialize pair of processes driving init_multihost +
solve_qp_sharded end to end over a cross-process mesh, each feeding its
local batch shard. The CPU twin of a multi-host TPU pod run."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_solve():
    worker = os.path.join(os.path.dirname(__file__),
                          "_multihost_worker.py")
    coord = f"127.0.0.1:{_free_port()}"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # one CPU device per process
    env["PYTHONPATH"] = os.path.join(os.path.dirname(__file__), "..")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            text=True)
        for i in range(2)
    ]
    outs = []
    try:
        for pr in procs:
            out, _ = pr.communicate(timeout=240)
            outs.append(out)
    finally:
        for pr in procs:
            if pr.poll() is None:
                pr.kill()
    for i, (pr, out) in enumerate(zip(procs, outs)):
        assert pr.returncode == 0, f"proc {i} failed:\n{out}"
        assert f"proc {i}: OK" in out, out
