"""Fused one-sided power-spectrum kernel (pencil layout).

The reference library exists to feed radio-astronomy pipelines
(reference README.md:2 — Astro-Accelerate), whose periodicity searches
consume |X_k|^2, not spectra.  Computing that as rfft -> XLA square
costs a full extra HBM round-trip over the spectrum; this kernel fuses
the square into the R2C plane math (ops/pencil.py `_rfft_planes`), so a
real (B, n) block becomes one-sided power (B, n/2) in a SINGLE pass:
6 bytes of HBM traffic per real sample (4 in + 2 out) vs the rfft's 8.
An optional window rides the load for free (one VPU multiply before the
pencil relayout) — the periodogram/Welch building block.

Output layout: L = n/2 bins; slot k = |X_k|^2 for k = 1..L-1 and
slot 0 = DC^2.  The Nyquist bin is intentionally omitted — the packed
(DC, Nyquist) slot-0 convention (reference
SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:332-340) leaves no
real slot for it, and spectral-search consumers discard DC/Nyquist
anyway; use :func:`smfft_tpu.api.rfft` when the Nyquist bin matters.

Supported n: 256..4096 (the pencil real-ladder range); dispatch above
that falls back to rfft + XLA square in the signal-layer wrappers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops import pallas_c2c as _pc
from smfft_tpu.ops import pencil as _pe


def _power_block(x, n: int, slabs: int = 8, w=None):
    """One (slabs*128, n) real block -> (slabs*128, L) one-sided power.

    Window ``w`` (1, n) multiplies the rows before the transform; the
    square happens at PLANE level, so only one L-wide output pencil is
    assembled (half the from-pencil work of the rfft kernel)."""
    L = n // 2
    if w is not None:
        x = x * w
    sr, si = _pe._rfft_planes(_pe._planes(_pe._to_pencil(x, n, slabs),
                                          n, slabs), n)
    pw = [sr[k] * sr[k] + si[k] * si[k] for k in range(L)]
    pw[0] = sr[0] * sr[0]  # slot 0 = DC^2 (si[0] is the packed Nyquist)
    return _pe._from_pencil(jnp.concatenate(pw, axis=0), L, slabs)


@functools.lru_cache(maxsize=None)
def _build_power(n: int, has_window: bool, interpret: bool = False,
                 slabs: int = 8):
    L = n // 2
    rb = slabs * 128

    if interpret:
        def run_host(x, *wargs):
            w = wargs[0][0:1] if wargs else None
            with jax.disable_jit():
                outs = [_power_block(x[s:s + rb], n, slabs, w)
                        for s in range(0, x.shape[0], rb)]
                return jnp.concatenate(outs, axis=0)
        return run_host

    if has_window:
        def kernel(x_ref, w_ref, o_ref):
            o_ref[:] = _power_block(x_ref[:], n, slabs, w_ref[0:1, :])
    else:
        def kernel(x_ref, o_ref):
            o_ref[:] = _power_block(x_ref[:], n, slabs)

    real_spec = pl.BlockSpec((rb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    win_spec = pl.BlockSpec((8, n), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((rb, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(x, *wargs):
        b = x.shape[0]
        return pl.pallas_call(
            kernel, grid=(b // rb,),
            in_specs=[real_spec] + ([win_spec] if has_window else []),
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, L), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
        )(x, *wargs)
    return run


def power_pencil_planar(x: jnp.ndarray, n: int | None = None,
                        window: jnp.ndarray | None = None) -> jnp.ndarray:
    """Fused single-pass one-sided power spectrum: real (B, n) fp32 ->
    (B, n/2) fp32, slot 0 = DC^2, slot k = |X_k|^2 (Nyquist omitted —
    module docstring).  ``window`` (n,) is multiplied into each row
    inside the kernel.  Supported for 256 <= n <= 4096."""
    n = n or x.shape[-1]
    _pe._check_n(n, 256, 4096)
    if x.shape[-1] != n:
        raise ValueError(f"expected row width {n}, got {x.shape[-1]}")
    slabs = min(8, max(1, -(-x.shape[0] // 128)))
    run = _build_power(n, window is not None, _pc._INTERPRET, slabs)
    arrays = [x.astype(jnp.float32)]
    if window is not None:
        if window.shape != (n,):
            raise ValueError(f"window must be shape ({n},), got "
                             f"{window.shape}")
        arrays.append(jnp.broadcast_to(
            window.astype(jnp.float32)[None, :], (8, n)))
        rows = arrays[0].shape[0]
        rb = slabs * 128
        pad = (-rows) % rb
        if pad:
            arrays[0] = jnp.concatenate(
                [arrays[0], jnp.zeros((pad, n), jnp.float32)], axis=0)
        out = run(*arrays)
        return out[:rows] if pad else out
    return _pe._pad_run(arrays, slabs * 128, run)
