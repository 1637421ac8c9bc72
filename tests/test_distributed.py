"""Two-process jax.distributed smoke test (VERDICT r2 item 5).

The reference has no distribution of any kind (SURVEY.md §2.10); the
framework's multi-host story is parallel/distributed.py + the global-mesh
sharding layer.  This test actually exercises it: two OS processes, each
with 4 virtual CPU devices, form one 8-device runtime over a loopback
coordinator and run a jitted acoustic train step whose psum crosses the
process boundary.
"""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_acoustic_step():
    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "_distributed_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    env.pop("COORDINATOR_ADDRESS", None)

    procs = [
        subprocess.Popen(
            [sys.executable, worker, coordinator, "2", str(pid)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=repo_root,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-3000:]}"
        assert f"DIST-OK pid={pid} procs=2" in out, out[-2000:]

    # both processes computed the same global loss (one global program)
    losses = {
        line.rsplit("loss=", 1)[1]
        for out in outs
        for line in out.splitlines()
        if "DIST-OK" in line
    }
    assert len(losses) == 1, losses
