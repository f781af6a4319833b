"""Persistent XLA compilation cache for the TPU entry points.

The axon remote-compile tunnel is the slowest single resource in the
loop: a cold kernel compile costs 3-120 s, and bench/smoke rebuild the
same ~100 executables every process.  Enabling JAX's persistent
compilation cache keyed on HLO makes every re-run (and the driver's
own bench invocation) a warm start from disk.

Entry scripts (bench.py, tpu_smoke.py, verify.py, tools/*) call
``enable()`` explicitly; the library itself never does — the CPU test
suite compiles thousands of tiny throwaway executables that must not
churn the cache.  Opt out with SMFFT_COMPILE_CACHE=0.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (default:
    <repo>/.jax_cache).  Must run before the first jit compile; safe to
    call more than once.  Returns the cache dir, or None if disabled."""
    if os.environ.get("SMFFT_COMPILE_CACHE", "1") == "0":
        return None
    import jax

    path = path or os.environ.get("SMFFT_COMPILE_CACHE_DIR", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
