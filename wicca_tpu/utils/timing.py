"""Timing / profiling utilities (SURVEY.md §5 'Tracing': the reference has
only coarse wall-clock pairs, classifying_tools.py:533-562).

``StageTimer`` collects per-stage wall times; ``format_proc_time`` matches the
reference's human formatting role; ``trace`` wraps ``jax.profiler`` for
Perfetto traces of device work.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


def format_proc_time(seconds: float) -> str:
    """Human-readable duration (reference classifying_tools.py:73-102 role)."""
    seconds = int(round(seconds))
    h, rem = divmod(seconds, 3600)
    m, s = divmod(rem, 60)
    parts = []
    if h:
        parts.append(f"{h} h")
    if m:
        parts.append(f"{m} min")
    if s or not parts:
        parts.append(f"{s} sec")
    return " ".join(parts)


class StageTimer:
    """Accumulates wall time per named stage; totals() for structured logs."""

    def __init__(self):
        self._acc: dict[str, float] = defaultdict(float)
        self._count: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._count[name] += 1

    def totals(self) -> dict[str, float]:
        return dict(self._acc)

    def report(self) -> str:
        total = sum(self._acc.values()) or 1e-12
        lines = [
            f"{name:>20}: {t:8.3f}s ({100 * t / total:5.1f}%) x{self._count[name]}"
            for name, t in sorted(self._acc.items(), key=lambda kv: -kv[1])
        ]
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/wicca_tpu_trace"):
    """jax.profiler trace context (view in Perfetto / TensorBoard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
