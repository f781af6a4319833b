"""Device timing that survives unreliable async dispatch.

The reference times kernels with cudaEvent record/sync (timer.h:6-40),
excluding H2D copies (FFT-GPU-32bit.cu:868-869).  On the axon TPU tunnel,
``block_until_ready`` does not reliably block and per-dispatch RTT is
milliseconds, so we:

  * chain ``iters`` applications on-device inside ONE jit via
    ``jax.lax.fori_loop`` (with a data dependence so XLA cannot hoist the
    loop body — SURVEY.md §7 hard part (c)),
  * force completion with a scalar readback, and
  * difference two iteration counts to cancel fixed dispatch/readback cost.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _force(x) -> float:
    """Force execution; returns a cheap scalar derived from the result."""
    leaf = jax.tree_util.tree_leaves(x)[0]
    s = jax.jit(lambda v: jnp.sum(jnp.abs(jnp.real(v[:1]))))(leaf)
    return float(s)


def chain_timer(op: Callable, x, iters_lo: int = 4, iters_hi: int = 20,
                scale: float | None = None, repeats: int = 3) -> float:
    """Median per-application seconds of ``op`` chained on-device.

    ``op`` must map its input pytree to a like-shaped output.  ``scale``
    optionally rescales between applications to keep magnitudes bounded
    (an FFT grows values by ~sqrt(N) per pass).
    """

    def chained(n):
        @jax.jit
        def run(z):
            def body(_, acc):
                out = op(acc)
                if scale is not None:
                    out = jax.tree_util.tree_map(lambda a: a * scale, out)
                return out
            return jax.lax.fori_loop(0, n, body, z)
        return run

    lo, hi = chained(iters_lo), chained(iters_hi)
    _force(lo(x))  # compile
    _force(hi(x))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(lo(x))
        t_lo = time.perf_counter() - t0
        t0 = time.perf_counter()
        _force(hi(x))
        t_hi = time.perf_counter() - t0
        samples.append((t_hi - t_lo) / (iters_hi - iters_lo))
    samples.sort()
    return samples[len(samples) // 2]


def one_shot_timer(fn: Callable, x, repeats: int = 5) -> float:
    """Median wall time of a single jitted call including dispatch (host
    view; use chain_timer for pure device time)."""
    fn(x)
    _force(fn(x))
    samples = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _force(fn(x))
        samples.append(time.perf_counter() - t0)
    samples.sort()
    return samples[len(samples) // 2]
