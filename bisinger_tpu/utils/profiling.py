"""Tracing / profiling utilities.

Covers the reference's observability hooks (`utils/__init__.py:223-251`,
`tasks/tts/fs2.py:624-630`) and adds proper TPU tracing:

  - `Timer`: named wall-clock accumulator context manager (prints totals
    on demand) — reference `utils.Timer`;
  - `AudioSecondsCounter`: the audio-seconds/s north-star throughput
    meter (reference `profile_infer` counter);
  - `trace`: `jax.profiler` trace context for TensorBoard-viewable
    device profiles;
  - `sync`: a hard device sync that works on the axon tunnel platform
    (fetches a scalar to host — `block_until_ready` can return early
    there).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


def sync(x=None) -> None:
    """Force completion of all queued device work (host fetch)."""
    if x is None:
        x = jnp.zeros(())
    float(jnp.asarray(x).sum())


class TimerRegistry:
    """Accumulation store for `Timer`. The reference keeps one global
    dict (`utils/__init__.py:223-238`); here the store is an object so
    tests and concurrent pipelines can isolate their measurements —
    `DEFAULT_TIMERS` below preserves the convenient shared-by-name
    behaviour for production code."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    def add(self, name: str, seconds: float):
        self.totals[name] += seconds
        self.counts[name] += 1

    def report(self) -> str:
        return "\n".join(
            f"| {name}: {total:.3f}s over {self.counts[name]} calls"
            for name, total in sorted(self.totals.items())
        )

    def reset(self):
        self.totals.clear()
        self.counts.clear()


DEFAULT_TIMERS = TimerRegistry()


class Timer:
    """Named wall-clock accumulator context manager (reference
    `utils.Timer`). Pass `registry=` for isolated accumulation."""

    def __init__(
        self,
        name: str,
        enabled: bool = True,
        device_sync: bool = False,
        registry: Optional[TimerRegistry] = None,
    ):
        self.name = name
        self.enabled = enabled
        self.device_sync = device_sync
        self.registry = registry if registry is not None else DEFAULT_TIMERS

    def __enter__(self):
        if self.enabled:
            if self.device_sync:
                sync()
            self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.enabled:
            if self.device_sync:
                sync()
            self.registry.add(self.name, time.perf_counter() - self.t0)

    @classmethod
    def report(cls) -> str:
        return DEFAULT_TIMERS.report()

    @classmethod
    def reset(cls):
        DEFAULT_TIMERS.reset()


class AudioSecondsCounter:
    """Generated-audio throughput meter (reference `profile_infer`
    accumulator, `tasks/tts/fs2.py:624-630`)."""

    def __init__(self, sample_rate: int):
        self.sample_rate = sample_rate
        self.audio_seconds = 0.0
        self.wall_start: Optional[float] = None

    def start(self):
        self.wall_start = time.perf_counter()
        self.audio_seconds = 0.0

    def add_samples(self, n_samples: int):
        if self.wall_start is None:
            self.start()
        self.audio_seconds += n_samples / self.sample_rate

    def add_frames(self, n_frames: int, hop_size: int):
        self.add_samples(n_frames * hop_size)

    @property
    def throughput(self) -> float:
        if self.wall_start is None or self.audio_seconds == 0:
            return 0.0
        return self.audio_seconds / (time.perf_counter() - self.wall_start)

    def report(self) -> str:
        return (
            f"| generated {self.audio_seconds:.2f}s audio, "
            f"{self.throughput:.2f} audio-s/s"
        )


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context (view in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
