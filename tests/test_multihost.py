"""Multi-host subsystem tests.

Unit tests for the row-span bookkeeping plus a REAL 2-process
``jax.distributed`` integration run on CPU (localhost coordinator, gloo
collectives): both processes build the global pixel mesh, render a sharded
frame through the fused Pallas kernel, and take one distributed train step
whose gradient psum crosses the process boundary.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import tpu_ray_tracer  # noqa: F401
from tpu_ray_tracer.parallel.multihost import _row_span

HERE = os.path.dirname(os.path.abspath(__file__))


def test_row_span_single_process():
    # 8 devices, one process: the whole image
    assert _row_span(48, [0] * 8, 0) == (0, 48)


def test_row_span_two_processes_even():
    pids = [0, 0, 1, 1]
    # 16 rows over 4 devices -> 4 rows/device, 8 per process
    assert _row_span(16, pids, 0) == (0, 8)
    assert _row_span(16, pids, 1) == (8, 8)


def test_row_span_ragged_tail():
    # 10 rows over 4 devices -> 3 rows/device; process 1 owns the clipped tail
    pids = [0, 0, 1, 1]
    assert _row_span(10, pids, 0) == (0, 6)
    assert _row_span(10, pids, 1) == (6, 4)
    # a process past the end of the image gets an empty span
    pids8 = [0] * 4 + [1] * 4
    assert _row_span(3, pids8, 1) == (3, 0)


def test_row_span_absent_process():
    assert _row_span(16, [0, 0], 3) == (0, 0)


def test_row_span_rejects_noncontiguous():
    with pytest.raises(ValueError):
        _row_span(16, [0, 1, 0, 1], 0)


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_distributed_render_and_train(tmp_path):
    """Spawn two real processes: jax.distributed over localhost, global
    mesh spanning both, sharded Pallas render parity vs the NumPy golden,
    and one train step with cross-process gradient psum."""
    port = _free_port()
    worker = os.path.join(HERE, "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "PYTHONPATH")}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port), str(tmp_path)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"

    results = []
    for pid in range(2):
        with open(tmp_path / f"result_{pid}.json") as f:
            results.append(json.load(f))

    for r in results:
        assert r["process_count"] == 2
        assert r["device_count"] == 4
        assert r["bad_frac"] <= 0.002, r
        assert np.isfinite(r["loss"]) and r["loss"] > 1e-8
        assert r["moved"]
    # the replicated loss must agree across processes
    assert abs(results[0]["loss"] - results[1]["loss"]) <= 1e-12
    # checkpoint-while-distributed: only process 0 writes the shared path
    # (2 steps x checkpoint_every=1), process 1 never does, and the final
    # file is a valid step-2 checkpoint on both processes' view of disk
    writes = sorted(r["ckpt_writes"] for r in results)
    assert writes == [0, 2], writes
    assert all(r["ckpt_step"] == 2 for r in results), results
    # host-local strips tile the image
    spans = sorted((r["row_start"], r["row_count"]) for r in results)
    assert spans[0][0] == 0
    assert spans[0][0] + spans[0][1] == spans[1][0]
    assert spans[1][0] + spans[1][1] == 16
