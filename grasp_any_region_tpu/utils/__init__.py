from .profiling import PhaseTimer, annotate, device_memory_stats, trace  # noqa: F401
