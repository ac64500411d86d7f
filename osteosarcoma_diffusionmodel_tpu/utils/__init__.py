from .profiling import (
    StepTimer,
    device_memory_stats,
    enable_compilation_cache,
    profile_trace,
)

__all__ = [
    "StepTimer",
    "device_memory_stats",
    "enable_compilation_cache",
    "profile_trace",
]
