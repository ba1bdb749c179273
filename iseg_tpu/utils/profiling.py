"""Profiling / step-timing utilities.

Parity with the reference's TensorBoard-profiler window
(``core_train.py:121-126`` ``profile_batch`` at 10% of the epoch when
``use_profiler=True``) — TPU-native via ``jax.profiler`` traces plus a
lightweight wall-clock step timer (the ``TimeCallback`` analogue for steps).
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Rolling step timer: call ``tick()`` once per step (after blocking on
    outputs); ``summary()`` gives p50/p90/mean seconds."""

    def __init__(self, window: int = 100):
        self.window = window
        self._times: list[float] = []
        self._last: Optional[float] = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        dt = None
        if self._last is not None:
            dt = now - self._last
            self._times.append(dt)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now
        return dt

    def summary(self) -> dict:
        if not self._times:
            return {}
        s = sorted(self._times)
        n = len(s)
        return {
            "mean_s": sum(s) / n,
            "p50_s": s[n // 2],
            # nearest-rank p90: ceil(0.9n)-1, NOT int(0.9n) (which lands
            # on the max for most n — one recompile straggler would then
            # masquerade as the p90)
            "p90_s": s[max(0, -(-9 * n // 10) - 1)],
            "steps": n,
        }
