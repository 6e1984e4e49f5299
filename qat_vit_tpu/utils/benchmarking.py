"""Shared timing helpers for the tunneled-TPU benchmark scripts.

The tunnel's ``block_until_ready`` does not round-trip (CLAUDE.md), so every
bench measures by materializing a SCALAR result (``float(...)`` forces a real
host transfer) around a loop that runs INSIDE one jitted program, then
subtracts the measured dispatch overhead of a trivial jitted op. One
definition here — the methodology changed once already (best-of-REPEATS vs a
single overhead sample) and had to be fixed in several copies.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

REPEATS = 3


def time_scalar(fn: Callable[[], object], repeats: int = REPEATS) -> float:
    """Best-of-``repeats`` wall time of ``float(fn())`` (first call compiles)."""
    float(fn())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def dispatch_overhead(repeats: int = REPEATS) -> float:
    """Round-trip cost of dispatching a trivial jitted op (best-of-repeats).

    Subtract this from :func:`time_scalar` results; on the tunnel it is
    ~25 ms and dominated by the RPC, not the op.
    """

    @jax.jit
    def t(x):
        return x + 1.0

    return time_scalar(lambda: t(jnp.zeros(())), repeats=repeats)
