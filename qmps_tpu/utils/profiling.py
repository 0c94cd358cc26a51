"""Profiling hooks (SURVEY section 5: the reference has only ad-hoc
time.time() microbenchmarks; here: jax.profiler traces + throughput
counters)."""
from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/qmps_tpu_trace"):
    """Capture a jax.profiler trace around a block (view with
    tensorboard/xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class Throughput:
    """steps/sec (or evals/sec) counter with block_until_ready semantics."""

    def __init__(self, unit: str = "steps"):
        self.unit = unit
        self.n = 0
        self.t0 = None

    def start(self):
        self.t0 = time.perf_counter()
        self.n = 0
        return self

    def tick(self, k: int = 1):
        self.n += k

    def rate(self, result=None) -> float:
        if result is not None:
            jax.block_until_ready(result)
        dt = time.perf_counter() - self.t0
        return self.n / dt if dt > 0 else float("inf")
