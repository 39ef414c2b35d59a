"""Profiling / tracing hooks.

The reference has no tracing at all (tqdm bars + datetime prints,
SURVEY.md section 5). Here: jax.profiler annotations around the hot phases so
a TensorBoard/Perfetto trace attributes device time to pipeline stages, plus
a lightweight wall-clock phase timer for console summaries.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


@contextlib.contextmanager
def trace_phase(name: str):
    """jax.profiler TraceAnnotation + StepTraceAnnotation-compatible scope."""
    with jax.profiler.TraceAnnotation(name):
        yield


def start_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)


def stop_trace():
    jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulates host wall-clock per phase; print with .summary()."""

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        with trace_phase(name):
            yield
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> str:
        lines = []
        for name in sorted(self.totals, key=self.totals.get, reverse=True):
            t, n = self.totals[name], self.counts[name]
            lines.append(f"{name:32s} {t:8.2f}s total {t / n * 1e3:8.1f}ms/it"
                         f" x{n}")
        return "\n".join(lines)
