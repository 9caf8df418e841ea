"""Profiling/tracing helpers.

The reference has no tracing (SURVEY §5: tqdm postfix only); on TPU we expose
jax.profiler trace capture around training windows plus a lightweight samples/s/chip
meter for the driver/benchmarks.
"""
from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fab_tpu_trace"):
    """Capture a profiler trace (view with TensorBoard / xprof) around a block."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """samples/s (per chip) over a sliding window; call update(n) per step."""

    def __init__(self, n_devices: Optional[int] = None):
        self.n_devices = n_devices or len(jax.devices())
        self.reset()

    def reset(self) -> None:
        self.t0 = time.time()
        self.samples = 0

    def update(self, n_samples: int) -> None:
        self.samples += n_samples

    @property
    def samples_per_s(self) -> float:
        dt = max(time.time() - self.t0, 1e-9)
        return self.samples / dt

    @property
    def samples_per_s_per_chip(self) -> float:
        return self.samples_per_s / self.n_devices
