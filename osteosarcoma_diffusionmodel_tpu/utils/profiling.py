"""Tracing and timing — observability the reference lacks entirely
(SURVEY §5: "Tracing / profiling: absent"; tqdm bars are its only
progress signal).

Provides:
- `StepTimer`: per-step wall-clock meter with throughput summaries
  (reports the framework's native patients/sec metric)
- `profile_trace`: context manager around `jax.profiler` writing a
  TensorBoard-loadable trace
- `device_memory_stats`: live HBM usage per device when the backend
  exposes it
"""

from __future__ import annotations

import contextlib
import logging
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax

logger = logging.getLogger(__name__)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache.

    First compiles of the production-dim training program take minutes
    on a tunneled TPU; the cache makes subsequent pipeline invocations
    (train -> generate -> serve, reruns, resume) start instantly.
    """
    import os

    cache_dir = cache_dir or os.path.join(
        os.path.expanduser("~"), ".cache", "osteosarcoma_jax"
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Persist everything: the validate step alone runs ~100 small
        # jit programs of ~1 s compile each — below the default 1 s
        # floor they were recompiled on every pipeline invocation
        # (measured 97 s of a 175 s validate). Cache entries are small;
        # disk is cheaper than tunneled-TPU compile time.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except (AttributeError, ValueError):  # pragma: no cover
        logger.warning("Could not enable the JAX compilation cache")


@dataclass
class StepTimer:
    """Accumulates per-step durations; reports rates."""

    name: str = "step"
    durations: List[float] = field(default_factory=list)
    _t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.durations.append(time.perf_counter() - self._t0)
        self._t0 = None

    @property
    def total(self) -> float:
        return sum(self.durations)

    @property
    def count(self) -> int:
        return len(self.durations)

    def rate(self, items_per_step: int = 1) -> float:
        """Items (steps, patients, samples) per second."""
        if not self.durations:
            return 0.0
        return self.count * items_per_step / self.total

    def summary(self) -> Dict[str, float]:
        if not self.durations:
            return {"count": 0}
        return {
            "count": self.count,
            "total_s": self.total,
            "mean_s": self.total / self.count,
            "min_s": min(self.durations),
            "max_s": max(self.durations),
            "per_sec": self.rate(),
        }


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace scope (view in TensorBoard / xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("Profiler trace written to %s", log_dir)


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device memory stats where the backend provides them."""
    stats = {}
    for device in jax.devices():
        try:
            stats[str(device)] = device.memory_stats() or {}
        except (AttributeError, NotImplementedError):
            stats[str(device)] = {}
    return stats
