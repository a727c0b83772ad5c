"""Multi-process (multi-host-shaped) runtime test: 2 real OS processes x
4 virtual CPU devices each, bootstrapped with parallel.multihost, running
landmark-sharded BA whose psum crosses the inter-process DCN mesh axis.

This is the CPU stand-in for a 2-host TPU pod: same
jax.distributed.initialize handshake, same hybrid mesh construction,
same collectives — only the transport differs.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

LOCAL_DEVICES = 4


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
@pytest.mark.parametrize("n_proc", [2, 4])
def test_multi_process_sharded_frontend_and_ba(n_proc):
    """N real OS processes x 4 virtual CPU devices each: sharded
    front-end + cross-process matching (DCN collective permute) AND
    landmark-sharded BA, both on the hybrid mesh.  n_proc=4 covers the
    >2-process coordination path."""
    worker = Path(__file__).parent / "multihost_worker.py"
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={LOCAL_DEVICES}")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(port), str(n_proc), str(pid)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for pid in range(n_proc)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process={pid}" in out, out
        assert "frontend_kp=" in out, out
