from .profiling import StepTimer, device_memory_stats, profile_trace

__all__ = ["StepTimer", "device_memory_stats", "profile_trace"]
