"""Profiling / tracing harness.

Rebuild of the reference's tracing (SURVEY.md §5: per-section wall-clock
counters + torch.profiler) the TPU way: jax.profiler traces viewable in
TensorBoard/XProf, plus a block_until_ready timing helper for bench code.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def xprof_trace(logdir: str):
    """Capture a device trace: `with xprof_trace('/tmp/trace'): step()`."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _value_fetch(out):
    """Device->host VALUE fetch of one output leaf. block_until_ready can
    return EARLY on this image's tunneled TPU (CLAUDE.md timing invariant:
    timing must end with a value fetch); materializing a result leaf cannot.
    """
    import numpy as np

    leaves = jax.tree_util.tree_leaves(out)
    if leaves:
        np.asarray(leaves[0]).ravel()[:1]


def timed(fn, *args, iters: int = 10, warmup: int = 2):
    """Wall-clock a jitted fn with proper device sync. Returns (mean_s, out)."""
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _value_fetch(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _value_fetch(out)
    return (time.perf_counter() - t0) / iters, out


class SectionTimers:
    """Named wall-clock sections (the reference's dashboard counters)."""

    def __init__(self):
        self.totals = {}

    @contextlib.contextmanager
    def section(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] = self.totals.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> dict:
        total = sum(self.totals.values()) or 1.0
        return {k: {"s": round(v, 3), "pct": round(100 * v / total, 1)}
                for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])}
