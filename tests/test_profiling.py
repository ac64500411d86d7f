"""Observability utilities: StepTimer, profiler trace, memory stats."""

import time
from pathlib import Path

from osteosarcoma_diffusionmodel_tpu.utils.profiling import (
    StepTimer,
    device_memory_stats,
    profile_trace,
)


def test_step_timer_rates():
    timer = StepTimer("train")
    for _ in range(3):
        with timer:
            time.sleep(0.01)
    assert timer.count == 3
    assert timer.total >= 0.03
    summary = timer.summary()
    assert summary["count"] == 3
    assert summary["per_sec"] > 0
    # patients/sec style: items_per_step multiplies the rate.
    assert timer.rate(items_per_step=100) > timer.rate()


def test_step_timer_empty():
    assert StepTimer().summary() == {"count": 0}
    assert StepTimer().rate() == 0.0


def test_profile_trace_writes(tmp_path):
    import jax
    import jax.numpy as jnp

    with profile_trace(str(tmp_path / "trace")):
        jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    assert any((tmp_path / "trace").rglob("*"))


def test_profile_trace_disabled(tmp_path):
    with profile_trace(str(tmp_path / "trace"), enabled=False):
        pass
    assert not (tmp_path / "trace").exists()


def test_device_memory_stats():
    stats = device_memory_stats()
    assert len(stats) >= 1
    assert all(isinstance(v, dict) for v in stats.values())
