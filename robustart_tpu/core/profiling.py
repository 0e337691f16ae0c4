"""Profiling / tracing hooks.

The reference has only wall-clock prints (SURVEY.md §5.1); this build adds
proper tooling: ``jax.profiler`` trace capture around any phase, named
annotations inside solver loops, and a lightweight phase timer whose report
prints a prettytable-style summary.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

from robustart_tpu.core.logging import get_logger

logger = get_logger(__name__)


@contextlib.contextmanager
def trace(log_dir: str | None):
    """Capture a jax.profiler trace for the enclosed phase (no-op if None).

    View with TensorBoard or xprof: ``trace('/tmp/rt_trace')``.
    """
    if not log_dir:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)


def annotate(name: str):
    """Named region visible in profiler timelines."""
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulating wall-clock phase timer for solver loops."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'phase':<24}{'total_s':>10}{'calls':>8}{'mean_ms':>10}"]
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            total = self.totals[name]
            n = self.counts[name]
            lines.append(
                f"{name:<24}{total:>10.3f}{n:>8}{1000 * total / n:>10.2f}"
            )
        return "\n".join(lines)

    def log_report(self):
        for line in self.report().splitlines():
            logger.info("%s", line)
