"""Per-stage wall-clock timing + run statistics.

Replaces the reference's timer family (startTimer/getTimer
src/Stereo3DMST.cpp:15-26, StartTimer/GetTimer + cudaEvent timers
src/PatchMatchStereoGPU.cu:9479-9535) and its mean/stddev helper
`timingStat` (.cu:9493-9517). Device work is made observable with
jax.block_until_ready, and `jax.profiler` can wrap any stage for traces.
"""

from __future__ import annotations

import time
from contextlib import contextmanager
from dataclasses import dataclass, field

import jax

__all__ = ["StageTimer", "timing_stat", "profile_trace"]


@contextmanager
def profile_trace(log_dir: str):
    """Wrap a region in a jax.profiler trace (the structured replacement
    for the reference's ad-hoc stage prints; view with TensorBoard or
    xprof). Usage: `with profile_trace("/tmp/trace"): run_pipeline()`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timing_stat(samples) -> tuple[float, float]:
    """(mean, stddev) over timing samples in ms (ref: timingStat,
    src/PatchMatchStereoGPU.cu:9493-9517)."""
    n = len(samples)
    if n == 0:
        return 0.0, 0.0
    mean = sum(samples) / n
    var = sum((s - mean) ** 2 for s in samples) / n
    return mean, var**0.5


@dataclass
class StageTimer:
    """Accumulates per-stage wall times; blocks on device results so the
    numbers mean what the reference's per-stage prints meant."""

    verbose: bool = False
    stages: dict = field(default_factory=dict)

    @contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        dt = (time.perf_counter() - t0) * 1e3
        self.stages.setdefault(name, []).append(dt)
        if self.verbose:
            print(f"{name}: {dt:.1f} ms")

    def time(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) * 1e3
        self.stages.setdefault(name, []).append(dt)
        if self.verbose:
            print(f"{name}: {dt:.1f} ms")
        return out

    def report(self) -> str:
        lines = []
        for name, samples in self.stages.items():
            mean, std = timing_stat(samples)
            lines.append(f"{name}: {mean:.1f} ± {std:.1f} ms (n={len(samples)})")
        return "\n".join(lines)
