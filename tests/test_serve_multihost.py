"""Two-process multi-host SERVING smoke test (ROADMAP item 1).

tests/test_distributed.py proves multi-process TRAINING (global-mesh psum
across OS processes); this proves the serving engine on the same runtime:
SynthesisEngine(global_mesh=True) shards its fused synthesis program's
batch axis over a mesh spanning two processes, and both hosts obtain the
identical full waveform from replicated outputs.
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


def test_two_process_serving():
    coordinator = f"127.0.0.1:{_free_port()}"
    worker = os.path.join(os.path.dirname(__file__), "_serve_multihost_worker.py")
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
        assert f"SERVE-OK pid={pid} procs=2" in out, out[-2000:]

    # both hosts produced the identical full waveform (replicated outputs)
    hashes = {
        line.rsplit("sha=", 1)[1]
        for out in outs
        for line in out.splitlines()
        if "SERVE-OK" in line
    }
    assert len(hashes) == 1, hashes
