"""Tracing / profiling hooks.

The reference's only progress visibility is tqdm on the sampling loop and
Streamlit spinners (SURVEY.md §5); here the framework exposes real TPU
profiling: ``jax.profiler`` trace capture, named trace annotations around the
sampler / train step, and a simple steps-per-second timer.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def trace_annotation(name: str) -> Iterator[None]:
    """Named region in the TPU trace (shows up in TensorBoard/Perfetto)."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def profile_to(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed region."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steps/sec + p50 latency over a sliding window."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times: list[float] = []
        self._last: float | None = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def steps_per_sec(self) -> float:
        if not self._times:
            return 0.0
        return len(self._times) / sum(self._times)

    @property
    def p50_latency(self) -> float:
        if not self._times:
            return 0.0
        return sorted(self._times)[len(self._times) // 2]
