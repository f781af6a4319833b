"""Cross-cutting utilities: host<->device transfer helpers.

The analogue of the reference's utils_cuda.h cross-cutting header
(SURVEY.md §1).  Timing lives in bench.py's single-dispatch differencing
discipline (the only method that survives the axon tunnel; see
.claude/skills/verify)."""
