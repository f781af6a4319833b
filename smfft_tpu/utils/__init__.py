"""Cross-cutting utilities: host<->device transfer helpers and
device-side profiler timing.

The analogue of the reference's utils_cuda.h / timer.h cross-cutting
headers (SURVEY.md §1): ``transfer`` moves complex data across the axon
tunnel's planar-only boundary; ``prof_timing.device_time_ms`` is the
GpuTimer analogue (on-device program durations from the TPU's own trace
counters — host wall clocks on the tunnel are 2-3x phase-noisy).
"""
