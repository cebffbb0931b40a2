"""Profiling and step-timing instrumentation.

The reference has no profiling hooks — only wall-clock timestamps printed at
eval boundaries (SURVEY §5.1). This framework makes tracing first-class:

- ``trace(dir)``: context manager around ``jax.profiler`` emitting a
  TensorBoard-loadable trace (XLA op timeline, HBM usage) for any region.
- ``StepTimer``: lightweight host-side rate meter for fused train chunks.
- env-var activation for the zero-flag CLI: set ``TAT_PROFILE_DIR=/path`` and
  ``python main.py`` captures a trace of the first training segment.
"""

from __future__ import annotations

import contextlib
import os
import time
from dataclasses import dataclass, field
from typing import List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str, create_perfetto_link: bool = False):
    """Capture a jax profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def profile_dir_from_env() -> Optional[str]:
    return os.environ.get("TAT_PROFILE_DIR") or None


@dataclass
class StepTimer:
    """Accumulates step counts/wall time across fused chunks."""

    steps: int = 0
    seconds: float = 0.0
    chunks: List[tuple] = field(default_factory=list)  # (n_steps, seconds)
    _t0: float = field(default=0.0, repr=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_steps: int) -> float:
        dt = time.perf_counter() - self._t0
        self.steps += n_steps
        self.seconds += dt
        self.chunks.append((n_steps, dt))
        return dt

    @property
    def steps_per_sec(self) -> float:
        return self.steps / self.seconds if self.seconds > 0 else 0.0

    @property
    def steady_steps_per_sec(self) -> float:
        """Median per-chunk rate over multi-step chunks, excluding the first
        (which pays the XLA compile that the cumulative rate would smear
        over every step). Median rather than max so one lucky chunk cannot
        inflate the headline rate (advisor r4); with a single multi-step
        chunk there is nothing to exclude, so it is used as-is."""
        rates = [n / s for n, s in self.chunks if n > 1 and s > 0]
        if not rates:
            return self.steps_per_sec
        if len(rates) > 1:
            rates = rates[1:]
        return float(np.median(rates))

    def summary(self) -> str:
        return (
            f"{self.steps} steps in {self.seconds:.2f}s "
            f"({self.steps_per_sec:.1f} steps/s)"
        )


@contextlib.contextmanager
def annotate(name: str):
    """Named region visible in profiler traces (TraceAnnotation)."""
    with jax.profiler.TraceAnnotation(name):
        yield
