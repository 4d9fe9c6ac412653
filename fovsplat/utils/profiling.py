"""Stage-scoped timing + device profiling harness.

Counterpart of the reference's CUDA-event timing
(gaussian_renderer_fov/__init__.py:74-97) and its commented-out per-stage
cudaEventRecord scaffolding (SURVEY.md §5.1). Keeps the same stage taxonomy
(preprocess / bin / sort / blend) as named scopes; `trace()` wraps
jax.profiler for TensorBoard-viewable device traces.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax
import jax.numpy as jnp


def force(x) -> None:
    """Force device completion. block_until_ready alone does not reliably
    serialize under remote backends; reading one element does."""
    for leaf in jax.tree.leaves(x):
        if hasattr(leaf, "ravel"):
            float(jnp.asarray(leaf).ravel()[0])
            break


class StageTimer:
    """Accumulates wall time per named stage across frames."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, out=None):
        t0 = time.perf_counter()
        holder = {}
        yield holder
        if "out" in holder:
            force(holder["out"])
        elif out is not None:
            force(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name, tot in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(f"{name:<14} {tot/n*1e3:8.2f} ms/frame  ({n} frames)")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fovsplat_trace"):
    """Device-level trace for TensorBoard (jax.profiler)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def benchmark(fn, *args, warmup: int = 3, reps: int = 10):
    """Timed repetitions with forced sync; returns seconds per call."""
    out = fn(*args)
    force(out)
    for _ in range(warmup):
        force(fn(*args))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        force(out)
    return (time.perf_counter() - t0) / reps
