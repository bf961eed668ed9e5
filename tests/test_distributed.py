"""Multi-host helpers + scaling harness mechanics (virtual CPU mesh)."""

import json
import subprocess
import sys

import numpy as np

from rkmh_tpu.parallel.distributed import host_read_shard, initialize


def test_host_read_shard_partitions_exactly():
    for n_proc in (1, 2, 3, 7, 8):
        for n_rec in (0, 1, 5, 100, 1001):
            spans = [
                host_read_shard(n_rec, process_id=p, num_processes=n_proc)
                for p in range(n_proc)
            ]
            # contiguous, disjoint, exhaustive
            assert spans[0][0] == 0
            assert spans[-1][1] == n_rec
            for (a0, a1), (b0, b1) in zip(spans, spans[1:]):
                assert a1 == b0
            sizes = [b - a for a, b in spans]
            assert max(sizes) - min(sizes) <= 1  # balanced


def test_initialize_single_process_noop():
    # no coordinator configured -> returns without touching jax.distributed
    initialize()


def test_scaling_harness_runs():
    out = subprocess.run(
        [sys.executable, "bench_scaling.py"],
        capture_output=True, text=True, timeout=900,
        env={
            "PATH": "/usr/bin:/bin:/usr/local/bin",
            "PYTHONPATH": "/root/repo",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "HOME": "/root",
        },
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-800:]
    lines = [json.loads(l) for l in out.stdout.strip().splitlines()]
    rows = [l for l in lines if "devices" in l]
    assert [r["devices"] for r in rows] == [1, 2, 4]
    assert all(r["reads_per_sec"] > 0 for r in rows)
