"""Execute the multi-host path: 2 real processes, 1 CPU device each.

VERDICT.md r1, Missing #3: ``parallel/multihost.py`` had never been
executed.  This test launches two OS processes that
``jax.distributed.initialize`` against a local coordinator (gloo CPU
collectives) and run a TP=2 packed forward + cached decode step through
shard_map across the process boundary — the same program a 2-host TPU
deployment runs, minus ICI (SURVEY.md §2.5 / BASELINE config #5).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_tp_forward_and_decode():
    here = os.path.dirname(os.path.abspath(__file__))
    worker = os.path.join(here, "multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=300)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out:\n" + "\n".join(outs))
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"
        assert f"MULTIHOST_ENGINE_OK {pid}" in out, \
            f"worker {pid} output:\n{out}"
        assert f"MULTIHOST_OK {pid}" in out, f"worker {pid} output:\n{out}"
