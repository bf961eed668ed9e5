"""Observability: structured metrics + profiler hooks.

The reference's only observability is cerr progress lines (SURVEY.md §5).
Here every command run can emit one structured JSON metrics line and a
full device trace:

* ``RKMH_TPU_METRICS=1`` (or CLI --metrics) — on exit, one JSON line to
  stderr: command, wall seconds, reads/bp processed, reads/s, bp/s, plus
  any phase timers commands recorded.
* ``RKMH_TPU_PROFILE=<dir>`` — wraps the run in jax.profiler.start_trace /
  stop_trace; open the dir with TensorBoard or xprof to see per-kernel
  device time.

Counters are process-global and cheap (plain ints); the IO layer counts
reads/bp as batches are yielded, so every command gets throughput metrics
for free.
"""

from __future__ import annotations

import json
import os
import sys
import time
from collections import defaultdict
from contextlib import contextmanager

COUNTERS: dict[str, float] = defaultdict(float)
TIMERS: dict[str, float] = defaultdict(float)


def count(name: str, n: float) -> None:
    COUNTERS[name] += n


@contextmanager
def phase(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        TIMERS[name] += time.perf_counter() - t0


def metrics_enabled() -> bool:
    return os.environ.get("RKMH_TPU_METRICS", "0") == "1"


@contextmanager
def observed_run(command: str, enabled: bool | None = None):
    """Wrap a command run: profiler trace + metrics line on exit."""
    enabled = metrics_enabled() if enabled is None else enabled
    profile_dir = os.environ.get("RKMH_TPU_PROFILE", "")
    tracing = False
    if profile_dir:
        import jax

        jax.profiler.start_trace(profile_dir)
        tracing = True
    COUNTERS.clear()
    TIMERS.clear()
    t0 = time.perf_counter()
    try:
        yield
    finally:
        wall = time.perf_counter() - t0
        if tracing:
            import jax

            jax.profiler.stop_trace()
            print(f"rkmh-tpu: device trace written to {profile_dir}", file=sys.stderr)
        if enabled:
            line = {"command": command, "wall_s": round(wall, 3)}
            for k, v in sorted(COUNTERS.items()):
                line[k] = int(v)
                if wall > 0:
                    line[f"{k}_per_sec"] = round(v / wall, 1)
            for k, v in sorted(TIMERS.items()):
                line[f"t_{k}_s"] = round(v, 3)
            print(json.dumps(line), file=sys.stderr)
