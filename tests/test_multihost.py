"""2-process multi-host integration test (CPU backend, localhost
coordinator) — the process-boundary half of BASELINE.md's 2-host scaling
bar that can be proven without TPU hardware. Each worker gets 2 virtual
CPU devices; the DP train step's gradient pmean and the tile-sharded
renderer's all-to-all/all-gather run across the process boundary
(tests/multihost_worker.py)."""

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


def test_two_process_dp_and_tile_shard():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    worker = os.path.join(root, "tests", "multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if not k.startswith(("JAX_", "XLA_", "PALLAS_"))}
    env.update({
        "PYTHONPATH": "",                 # drop the axon sitecustomize
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=2",
        "JAX_ENABLE_X64": "0",
    })
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), "2", str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env=env, cwd=root) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        ok = [l for l in out.splitlines() if l.startswith("OK ")]
        assert ok, out
        outs.append(ok[-1])
    # Replicated outputs must agree across processes.
    assert outs[0] == outs[1], outs
