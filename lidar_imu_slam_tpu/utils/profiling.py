"""Tracing / profiling helpers (SURVEY §5: the reference has none — its
diagnostics are cout pose dumps, reference src/odom_run.cpp:111-112).

Wraps jax.profiler for device traces viewable in XProf/TensorBoard, plus a
lightweight host-side stage timer for the runner loop.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Iterator

import jax


@contextlib.contextmanager
def device_trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace: `with device_trace("/tmp/trace"): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in the device trace."""
    return jax.profiler.TraceAnnotation(name)


class StageTimer:
    """Accumulating host-side stage timer.

    with timer.stage("preprocess"): ...
    print(timer.report())
    """

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:30s} {t:8.3f}s total  {t / max(n, 1) * 1e3:8.2f}ms avg  x{n}")
        return "\n".join(lines)


def block_and_time(fn, *args, repeats: int = 10, **kw):
    """Wall-clock a jitted callable (post-warmup), returns seconds/call."""
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / repeats
