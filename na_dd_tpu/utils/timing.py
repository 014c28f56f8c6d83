"""Structured timing: compile vs execute split.

The reference only prints wall-clock totals (src/cvg_studies_base.py:138-217).
For benchmarking jitted programs the first call includes XLA compilation; this
helper measures both phases explicitly.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass
from typing import Dict

import jax


@dataclass
class Timed:
    name: str
    seconds: float


@contextlib.contextmanager
def timed_block(record: Dict[str, float], name: str, *, sync=None):
    """Context manager appending elapsed wall-clock to ``record[name]``.

    Pass ``sync=x`` (a jax array / pytree) to block on device completion.
    """
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        record[name] = record.get(name, 0.0) + (time.perf_counter() - t0)


@contextlib.contextmanager
def xla_trace(log_dir: str):
    """Capture an XLA/device profile (view with TensorBoard or xprof).

    The reference has no profiling at all (SURVEY.md §5); this wraps
    ``jax.profiler`` so study/bench runs can record device timelines:

        with xla_trace('/tmp/na_dd_trace'):
            run_for_errors(...)
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def time_compile_and_run(fn, *args, reps: int = 3):
    """Return (compile_plus_first_run_s, best_steady_run_s, result)."""
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    first = time.perf_counter() - t0
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return first, best, out
