"""Tracing / profiling subsystem.

The reference has no tracing or profiling at all — only tqdm progress bars
(`models/wrapper.py:49`, SURVEY §5).  TPU-native replacements:

- :class:`StepTimer` — lightweight step-time accumulator: records per-step
  wall time, reports throughput (examples/sec) and latency percentiles
  (p50/p90/p99).  This is the BASELINE north-star counter
  (clouds/sec/chip, p50 infer latency).
- :func:`maybe_trace` — context manager wrapping ``jax.profiler.trace``:
  captures an XLA/TensorBoard trace of the wrapped region into
  ``{log_dir}/plugins/profile`` when ``PCC_TRACE=1`` (or ``force=True``),
  and is a no-op otherwise so the hot loop never pays for it.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from typing import List, Optional


class StepTimer:
    """Accumulates step wall-times; derives throughput + latency percentiles."""

    def __init__(self, examples_per_step: Optional[int] = None):
        self.examples_per_step = examples_per_step
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self) -> None:
        if self._t0 is not None:
            self.times.append(time.perf_counter() - self._t0)
            self._t0 = None

    @contextlib.contextmanager
    def step(self):
        self.start()
        try:
            yield
        finally:
            self.stop()

    def _percentile(self, q: float) -> float:
        if not self.times:
            return 0.0
        xs = sorted(self.times)
        idx = min(int(round(q / 100.0 * (len(xs) - 1))), len(xs) - 1)
        return xs[idx]

    def summary(self) -> dict:
        n = len(self.times)
        total = sum(self.times)
        out = {
            "steps": n,
            "total_seconds": total,
            "mean_ms": (total / n * 1e3) if n else 0.0,
            "p50_ms": self._percentile(50) * 1e3,
            "p90_ms": self._percentile(90) * 1e3,
            "p99_ms": self._percentile(99) * 1e3,
        }
        if self.examples_per_step and total > 0:
            out["examples_per_sec"] = self.examples_per_step * n / total
        return out

    def dump(self, path: str) -> dict:
        s = self.summary()
        parent = os.path.dirname(path)
        if parent:  # a bare filename has no directory to create
            os.makedirs(parent, exist_ok=True)
        with open(path, "w") as f:
            json.dump(s, f, indent=4)
        return s


@contextlib.contextmanager
def maybe_trace(log_dir: Optional[str], force: bool = False):
    """``jax.profiler.trace`` when PCC_TRACE=1 (or force); else no-op.

    Traces land under ``{log_dir}/trace/`` (the profiler's own
    ``plugins/profile`` tree nests inside that)."""
    enabled = force or os.environ.get("PCC_TRACE") == "1"
    if not (enabled and log_dir):
        if enabled and log_dir is None:
            # explicit capture request with nowhere to write: say so
            # instead of silently dropping the trace
            import warnings

            warnings.warn(
                "maybe_trace: capture requested but log_dir is None — "
                "no trace will be written",
                stacklevel=2,
            )
        yield
        return
    import jax

    trace_dir = os.path.join(log_dir, "trace")
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield
