"""Multi-process runtime (SURVEY.md §5.8, VERDICT r1 missing #5).

Launches TWO real OS processes, each owning 2 virtual CPU devices, joined by
``jax.distributed`` through the qst_tpu hook — the CPU-process analogue of
two TPU hosts on one pod slice. The worker runs a REAL quadruplet train step
whose gradient psum crosses the process boundary; both processes must report
the identical loss. Also unit-tests the per-process sharding helpers.
"""

from __future__ import annotations

import os
import re
import socket
import subprocess
import sys

import pytest

from qst_tpu.core.meshes import process_shard_bounds

WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_process_shard_bounds():
    # even split
    assert process_shard_bounds(8, 0, 2) == (0, 4)
    assert process_shard_bounds(8, 1, 2) == (4, 8)
    # remainder goes to leading processes, full cover, no overlap
    bounds = [process_shard_bounds(10, i, 3) for i in range(3)]
    assert bounds == [(0, 4), (4, 7), (7, 10)]
    with pytest.raises(ValueError):
        process_shard_bounds(8, 2, 2)


def test_initialize_distributed_gate_closed(monkeypatch):
    from qst_tpu.core.meshes import COORDINATOR_ENV, initialize_distributed

    monkeypatch.delenv(COORDINATOR_ENV, raising=False)
    assert initialize_distributed() is False


def test_two_process_train_step():
    """2 processes x 2 CPU devices: one DP train step with cross-process
    gradient psum; identical loss on both ranks."""
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), "2", str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out}"
    losses = {}
    for out in outs:
        m = re.search(r"RESULT pid=(\d) nproc=2 ndev=4 loss=([\d.]+)", out)
        assert m, f"no RESULT line in:\n{out}"
        losses[int(m.group(1))] = float(m.group(2))
    assert set(losses) == {0, 1}
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)
    assert losses[0] > 0.0
