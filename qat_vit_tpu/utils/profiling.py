"""Profiling: jax.profiler trace capture + simple step timers.

Strictly more than the reference's observability (tqdm bars + MLflow system
metrics, reference qat_trainer.py:201, 323-328 — survey §5 "tracing"): traces
are XLA-level and open in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace for the enclosed block.

    View with ``tensorboard --logdir <log_dir>`` (profile plugin) or load the
    .trace.json.gz into Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Wall-clock step timer with warmup discard and summary stats."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._n = 0
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._n += 1
        if self._n > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean(self) -> float:
        return sum(self.times) / len(self.times) if self.times else float("nan")

    @property
    def p50(self) -> float:
        if not self.times:
            return float("nan")
        s = sorted(self.times)
        return s[len(s) // 2]

    def imgs_per_sec(self, batch_size: int) -> float:
        return batch_size / self.mean if self.times else 0.0
