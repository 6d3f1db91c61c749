"""Multi-host distributed backend (SURVEY.md §5.8): a REAL two-process
jax.distributed group on CPU, each process ingesting its own lanes of one
globally-sharded pipeline step. Shards must match the unsharded decode."""

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


def test_two_process_sharded_pipeline():
    worker = os.path.join(os.path.dirname(os.path.abspath(__file__)), "dist_worker.py")
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items() if not k.startswith("JAX_PLATFORMS")}
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen([sys.executable, worker, str(i), port],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed workers timed out")
        outs.append(out.decode("utf-8", "replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"DIST_OK {i}" in out
        assert f"DIST_ENGINE_OK {i}" in out  # MultiHostEngine bit-identity
