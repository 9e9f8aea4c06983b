"""Observability: structured per-iteration stats and profiler hooks.

The reference's only observability is three stdlib-logging calls
(SURVEY.md section 5). Here every ``optimize()`` records a structured
``IterationStats`` (host-side, from scalars already pulled off device)
and ``profile_trace`` wraps ``jax.profiler`` for TensorBoard-readable
device traces of the fused step.
"""

from __future__ import annotations

import contextlib
import dataclasses
import logging
import time
from typing import List, Optional

__all__ = ["IterationStats", "StatsRecorder", "profile_trace", "timed"]

logger = logging.getLogger("safeopt_tpu")


@dataclasses.dataclass
class IterationStats:
    """One optimize() iteration's diagnostics."""

    t: int                      # time step (observation count)
    duration_s: float           # wall clock of the fused step
    safe_count: int             # |S|
    maximizer_count: int        # |M|
    expander_found: bool        # G nonempty
    next_index: Optional[int]   # chosen grid index (SafeOpt only)
    beta: float
    # certified-path telemetry (exact_boundaries runs only; zeros
    # otherwise): candidates inside the f64 ambiguity band, f32
    # verdicts the oracle overturned (each costs the correction
    # dispatch), and whether any budget overflowed (voids the
    # certification guarantee for the un-triaged rows)
    band_population: int = 0
    certified_corrections: int = 0
    band_overflow: bool = False

    def as_dict(self):
        """Plain-dict view (for logging/JSON sinks)."""
        return dataclasses.asdict(self)


class StatsRecorder:
    """Ring buffer of per-iteration stats with logging passthrough."""

    def __init__(self, maxlen: int = 1000):
        self.maxlen = maxlen
        self.history: List[IterationStats] = []

    def record(self, stats: IterationStats) -> None:
        """Append one iteration's stats (evicts past ``maxlen``)."""
        self.history.append(stats)
        if len(self.history) > self.maxlen:
            self.history.pop(0)
        logger.debug("iteration stats: %s", stats)

    @property
    def last(self) -> Optional[IterationStats]:
        """Most recent iteration's stats (None before any record)."""
        return self.history[-1] if self.history else None

    def summary(self) -> dict:
        """Aggregate view: iteration count, mean step time, last |S|."""
        if not self.history:
            return {}
        times = [s.duration_s for s in self.history]
        return {
            "iterations": len(self.history),
            "mean_step_s": sum(times) / len(times),
            "last_safe_count": self.history[-1].safe_count,
        }


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace of the enclosed block (TensorBoard format).

    Usage::

        with profile_trace("/tmp/trace"):
            opt.optimize()
    """
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed():
    """Tiny wall-clock timer: ``with timed() as t: ...; t()`` -> seconds."""
    start = time.perf_counter()
    elapsed = [None]

    def read():
        return (elapsed[0] if elapsed[0] is not None
                else time.perf_counter() - start)

    try:
        yield read
    finally:
        elapsed[0] = time.perf_counter() - start
