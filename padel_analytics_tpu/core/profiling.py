"""Tracing / profiling / observability.

The reference's only instrumentation is wall-clock prints around whole
tracker passes (/root/reference/main.py:62,183-185, runner.py:222-232) and
tqdm bars. This module makes profiling a first-class subsystem:

- `StageTimer`: hierarchical named stage timing with device
  synchronization (block_until_ready) so GPU/TPU async dispatch doesn't
  fake the numbers;
- `device_trace`: context manager around `jax.profiler.trace` producing
  TensorBoard-loadable XLA traces;
- `log`: structured logging with a module-level verbosity switch
  (replaces the reference's scattered prints).
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional

import jax

VERBOSITY = 1  # 0 silent, 1 info, 2 debug


def log(msg: str, level: int = 1) -> None:
    if VERBOSITY >= level:
        print(msg)


class StageHandle:
    """Set `.value` to the stage's device output inside the body; the
    timer blocks on it at exit so async dispatch can't fake the number."""

    value: Optional[object] = None


class StageTimer:
    """Accumulating named-stage wall-clock timer.

    Synchronizing on values produced INSIDE the stage body:

        with timer.stage("fwd") as s:
            s.value = model.apply(variables, x)

    `sync` may also be a value that already exists at entry, or a
    zero-arg callable evaluated at exit (for state the body mutates).
    On the tunneled dev TPU block_until_ready is a no-op (BENCH.md) —
    there, force completion by downloading from `s.value` instead.
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync: Optional[object] = None):
        handle = StageHandle()
        t0 = time.perf_counter()
        try:
            yield handle
        finally:
            target = handle.value
            if target is None:
                target = sync() if callable(sync) else sync
            if target is not None:
                jax.block_until_ready(target)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            name: {
                "total_s": round(self.totals[name], 4),
                "count": self.counts[name],
                "mean_ms": round(1000 * self.totals[name] / self.counts[name], 3),
            }
            for name in self.totals
        }

    def dump(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """XLA profiler trace (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
