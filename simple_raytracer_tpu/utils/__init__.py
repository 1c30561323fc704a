"""Engine utilities: timing, throughput metrics, profiling."""

from .metrics import FrameTimer, StepLogger, profiler_trace, ray_throughput
