"""Lightweight stage profiling for the search pipeline.

The reference has no in-code tracing; its papers profiled externally with
cProfile and split runtime into candidate selection / ranking / I/O
(SURVEY.md §5, iprg2012_profiling.ipynb).  This module provides that split
as a first-class subsystem: nested stage timers with a single summary log,
plus an optional hook into `jax.profiler.trace` for device-level traces
(set ANN_SOLO_TPU_TRACE_DIR).
"""

from __future__ import annotations

import collections
import contextlib
import logging
import os
import time
from typing import Dict, Iterator, Optional

logger = logging.getLogger(__name__)


class StageProfiler:
    """Accumulates wall-clock time per named pipeline stage."""

    def __init__(self) -> None:
        self.totals: Dict[str, float] = collections.defaultdict(float)
        self.counts: Dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str) -> Iterator[None]:
        start = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - start
            self.counts[name] += 1

    def summary(self) -> str:
        if not self.totals:
            return "no stages recorded"
        total = sum(self.totals.values())
        parts = []
        for name, seconds in sorted(
            self.totals.items(), key=lambda kv: -kv[1]
        ):
            parts.append(
                f"{name}: {seconds:.2f}s ({100 * seconds / total:.0f}%, "
                f"n={self.counts[name]})"
            )
        return "; ".join(parts)

    def log_summary(self, prefix: str = "search profile") -> None:
        logger.info("%s: %s", prefix, self.summary())

    def reset(self) -> None:
        self.totals.clear()
        self.counts.clear()


# Process-wide profiler used by the search engine.
profiler = StageProfiler()


@contextlib.contextmanager
def device_trace(trace_dir: Optional[str] = None) -> Iterator[None]:
    """Optionally capture a jax.profiler trace around a block.

    Enabled when `trace_dir` or ANN_SOLO_TPU_TRACE_DIR is set; a no-op
    otherwise.
    """
    trace_dir = trace_dir or os.environ.get("ANN_SOLO_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
