"""Tracing / profiling utilities.

Reference (SURVEY.md §5.1): wall-clock Timer (common/include/timer.hpp)
around whole solves, NmfStats/ClustStats counters, per-iteration progress
prints.  TPU-native equivalents: the same Timer/stats surface plus
jax.profiler trace capture for XLA-level analysis and a NaN-debug mode
standing in for the reference's (absent) sanitizer story (§5.2).
"""

from __future__ import annotations

import contextlib
import time


class Timer:
    """Wall-clock timer (reference common/include/timer.hpp)."""

    def __init__(self):
        self._start = None
        self._elapsed = 0.0

    def start(self) -> None:
        self._start = time.perf_counter()

    def stop(self) -> None:
        if self._start is not None:
            self._elapsed += time.perf_counter() - self._start
            self._start = None

    def reset(self) -> None:
        self._start = None
        self._elapsed = 0.0

    def report_seconds(self) -> float:
        return self._elapsed

    def report_milliseconds(self) -> float:
        return self._elapsed * 1e3

    def report_microseconds(self) -> int:
        return int(self._elapsed * 1e6)


@contextlib.contextmanager
def timed(label: str, sink=None):
    """Context manager printing (or collecting) a phase duration."""
    t = Timer()
    t.start()
    try:
        yield t
    finally:
        t.stop()
        if sink is not None:
            sink[label] = sink.get(label, 0.0) + t.report_seconds()
        else:
            print(f"{label}: {t.report_seconds():.3f}s")


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (open with TensorBoard/XProf)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def debug_nans(enable: bool = True):
    """Scoped jax_debug_nans — the functional-purity analogue of the
    reference's opt-in AddressSanitizer build (SURVEY.md §5.2)."""
    import jax

    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def block_and_time(fn, *args, warmup: int = 1, reps: int = 5):
    """Measure steady-state device time of a jitted callable.

    Returns (seconds_per_call, last_output).  Blocks on completion so the
    async dispatch queue does not skew results.
    """
    import jax

    out = None
    for _ in range(max(warmup, 0)):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out
