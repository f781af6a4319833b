"""Cross-cutting utilities: host<->device transfer, timing, test metrics.

The analogue of the reference's debug.h / timer.h / utils_cuda.h
cross-cutting headers (SURVEY.md §1)."""
