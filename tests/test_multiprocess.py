"""Two-process distributed smoke test (VERDICT r1 missing #5).

Launches two real JAX processes over a localhost coordinator and drives
the multi-host code paths end-to-end: rendezvous, per-host shard split,
replicated packed indices, make_global_batch, one sharded packed train
step, and a global metric reduction.  Both processes must report the
SAME loss/grad-norm/psnr — SPMD determinism across hosts.

Kept in its own file: two concurrent CPU compiles take a few minutes on
a 1-core host.  Deselect with `-k "not multiprocess"` for quick runs.
"""

import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.skipif(sys.platform not in ("linux", "darwin"),
                    reason="needs POSIX subprocesses + localhost sockets")
def test_two_process_train_step():
    port = _free_port()
    env = {**os.environ,
           "JAX_PLATFORMS": "cpu",
           "XLA_FLAGS": "--xla_force_host_platform_device_count=1",
           "PYTHONPATH": REPO}
    env.pop("JAX_COORDINATOR_ADDRESS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(pid), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env,
        )
        for pid in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("two-process workers timed out:\n" + "\n".join(outs))

    results = {}
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        lines = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert lines, f"no RESULT line:\n{out[-3000:]}"
        _, pid, loss, gnorm, psnr = lines[-1].split()
        results[int(pid)] = (loss, gnorm, psnr)

    assert set(results) == {0, 1}
    # SPMD: every process computes the identical global values
    assert results[0] == results[1], results
    assert all(float(v) == float(v) for v in results[0])  # finite
