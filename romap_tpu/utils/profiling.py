"""Observability: structured timers + jax profiler traces.

The reference instruments with ad-hoc std::chrono prints (per-train-call ms,
tracking/mapping medians — SURVEY.md §5) and itself recommends Nsight for
real numbers (ref nerf_model.cu:1660). Here: a Timer registry with the same
console counters plus median/mean summaries, and a context manager around
jax.profiler for real device traces.
"""

from __future__ import annotations

import contextlib
import statistics
import time
from collections import defaultdict


class Timers:
    """Named wall-clock spans with median/mean summaries (host-side; device
    work must be synced by the caller — see the relay caveat in bench.py)."""

    def __init__(self):
        self.records: dict[str, list[float]] = defaultdict(list)

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.records[name].append(time.perf_counter() - t0)

    def add(self, name: str, seconds: float) -> None:
        self.records[name].append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for name, vals in self.records.items():
            out[name] = {
                "count": len(vals),
                "mean_ms": 1e3 * statistics.fmean(vals),
                "median_ms": 1e3 * statistics.median(vals),
                "total_s": sum(vals),
            }
        return out

    def report(self) -> str:
        # mirrors the reference's "median tracking time / mean tracking time"
        # console style (ref mono_tum.cc:120-122)
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(
                f"{name}: median {s['median_ms']:.2f} ms | mean "
                f"{s['mean_ms']:.2f} ms | n={s['count']}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
