"""Planar public API — the TPU-native performance interface.

On this hardware, ANY XLA op touching a ``complex64`` array moves at
~170-230 GB/s (device-measured: a pure complex scale runs at 230 GB/s,
``jnp.real``/``jnp.imag`` extraction at 226, ``lax.complex``
recombination at 173, a ``.view(float32)`` bitcast at 21 — against the
657 GB/s fp32 streaming roofline).  Pallas kernels cannot take complex
refs at all.  The complex-array API (:mod:`smfft_tpu.api`) therefore
pays an unavoidable ~3x toll at its boundary no matter how fast the
kernel is.

This module is the official way out: every transform as a function of
PLANAR data — separate fp32 real/imag arrays of shape (..., N) — the
exact format the kernels consume and produce, with zero conversion
passes.  ``bench.py``'s roofline numbers (653-658 GB/s external) are
numbers for THIS interface.  Data arriving from the host should cross
the boundary planar too (complex64 cannot cross the axon tunnel at
all — ``smfft_tpu.utils.transfer``).

Layout contracts (identical to the ops layer):
  * C2C: (vr, vi) fp32 (..., N) -> (or, oi) fp32 (..., N); natural
    order when ``ordered=True``, revblock otherwise.
  * R2C: real (..., N) -> packed planar pair (..., N/2), slot 0 =
    (DC, Nyquist) — the reference's packed layout
    (SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:332-340).
  * C2R: packed natural pair (..., N/2) -> real (..., N); numpy
    normalization under ``norm="backward"``, the reference's raw
    (N/2)-scale under ``norm=None``.

Batched over any leading shape.  Sizes follow the same static dispatch
contract as :mod:`smfft_tpu.api` ("Error wrong FFT length!").
"""

from __future__ import annotations

import jax.numpy as jnp

from smfft_tpu import api
from smfft_tpu import params as P


def _rows(a, n):
    """(..., n) -> ((B, n), batch_shape) fp32 rows."""
    a = jnp.asarray(a, jnp.float32)
    return a.reshape(-1, a.shape[-1]), a.shape[:-1]


def _check_pair(vr, vi):
    if vr.shape != vi.shape:
        raise ValueError(f"planar pair shapes differ: {vr.shape} vs "
                         f"{vi.shape}")


def fft(vr: jnp.ndarray, vi: jnp.ndarray, ordered: bool = True,
        precision: str | None = None):
    """Planar forward C2C FFT over the last axis: zero conversion
    passes, the 653-658 GB/s path."""
    _check_pair(vr, vi)
    n = vr.shape[-1]
    api._check_c2c(n)
    prec = api._resolve_precision(precision)
    from smfft_tpu.ops import pallas_c2c
    r, batch = _rows(vr, n)
    i, _ = _rows(vi, n)
    o_r, o_i = pallas_c2c.fft_planar(r, i, n, ordered=ordered,
                                     precision=prec)
    return o_r.reshape(batch + (n,)), o_i.reshape(batch + (n,))


def ifft(vr: jnp.ndarray, vi: jnp.ndarray, ordered: bool = True,
         precision: str | None = None, norm: str | None = "backward"):
    """Planar inverse C2C FFT; ``norm="backward"`` divides by N (numpy),
    ``norm=None`` is the reference's unnormalized inverse."""
    _check_pair(vr, vi)
    n = vr.shape[-1]
    api._check_c2c(n)
    prec = api._resolve_precision(precision)
    from smfft_tpu.ops import pallas_c2c
    r, batch = _rows(vr, n)
    i, _ = _rows(vi, n)
    scale = 1.0 / n if norm == "backward" else None
    o_r, o_i = pallas_c2c.fft_planar(r, i, n, inverse=True,
                                     ordered=ordered, precision=prec,
                                     scale=scale)
    return o_r.reshape(batch + (n,)), o_i.reshape(batch + (n,))


def ifft_unordered(vr: jnp.ndarray, vi: jnp.ndarray,
                   precision: str | None = None,
                   norm: str | None = "backward"):
    """Planar inverse consuming the revblock layout ``fft(ordered=False)``
    produces — the relayout-free roundtrip pair."""
    _check_pair(vr, vi)
    n = vr.shape[-1]
    api._check_c2c(n)
    prec = api._resolve_precision(precision)
    from smfft_tpu.ops import pallas_c2c
    r, batch = _rows(vr, n)
    i, _ = _rows(vi, n)
    scale = 1.0 / n if norm == "backward" else None
    o_r, o_i = pallas_c2c.fft_planar(r, i, n, inverse=True, rev_in=True,
                                     precision=prec, scale=scale)
    return o_r.reshape(batch + (n,)), o_i.reshape(batch + (n,))


def rfft(x: jnp.ndarray, ordered: bool = True,
         precision: str | None = None):
    """Planar R2C: real (..., N) -> packed planar pair (..., N/2) with
    slot 0 = (DC, Nyquist); natural bin order when ``ordered=True``,
    revblock otherwise (pairs with :func:`irfft` in_natural flag)."""
    n = x.shape[-1]
    if n not in P.SUPPORTED_REAL_SIZES or n < 256:
        raise ValueError(
            f"Error wrong FFT length! N={n}; planar rfft supports "
            f"{[s for s in P.SUPPORTED_REAL_SIZES if s >= 256]}")
    prec = api._resolve_precision(precision)
    from smfft_tpu.ops import pallas_real
    r, batch = _rows(x, n)
    hr, hi = pallas_real.rfft_fused_planar(r, precision=prec,
                                           ordered=ordered)
    return hr.reshape(batch + (n // 2,)), hi.reshape(batch + (n // 2,))


def irfft(vr: jnp.ndarray, vi: jnp.ndarray, n: int | None = None,
          precision: str | None = None, norm: str | None = "backward",
          in_natural: bool = True):
    """Planar C2R: packed spectrum pair (..., N/2) -> real (..., N).
    ``in_natural=False`` consumes the revblock layout of
    ``rfft(ordered=False)`` relayout-free."""
    _check_pair(vr, vi)
    n = n or vr.shape[-1] * 2
    if n not in P.SUPPORTED_REAL_SIZES or n < 256:
        raise ValueError(f"Error wrong FFT length! N={n}")
    prec = api._resolve_precision(precision)
    from smfft_tpu.ops import pallas_real
    r, batch = _rows(vr, n // 2)
    i, _ = _rows(vi, n // 2)
    out = pallas_real.irfft_fused_planar(r, i, n, precision=prec,
                                         in_natural=in_natural)
    if norm == "backward":
        out = out / (n // 2)
    return out.reshape(batch + (n,))


def fft_large(vr: jnp.ndarray, vi: jnp.ndarray,
              precision: str | None = None):
    """Planar huge-N forward C2C FFT (N = 2**15..2**28, natural order),
    zero conversion passes: N = 2**15..2**17 run as ONE fused HBM pass
    (ops/rowfour.py); larger N as two fused passes (ops/fourstep_fused
    .py) — all transposes in VMEM, the inter-factor twiddle fused into
    pass 1's epilogue.  Row sizes (N <= 16384) route to :func:`fft`."""
    _check_pair(vr, vi)
    from smfft_tpu.ops import fourstep_fused
    from smfft_tpu.ops.fourstep import split_factors
    n = vr.shape[-1]
    if n not in P.SUPPORTED_C2C_SIZES:
        split_factors(n)   # raises the reference-style size error
    return fourstep_fused.dispatch_planar(
        jnp.asarray(vr, jnp.float32), jnp.asarray(vi, jnp.float32),
        precision=precision)


def ifft_large(vr: jnp.ndarray, vi: jnp.ndarray,
               precision: str | None = None,
               norm: str | None = "backward"):
    """Planar huge-N inverse C2C FFT; ``norm="backward"`` folds the 1/N
    into the fused twiddle tables (free), ``norm=None`` is the raw
    unnormalized inverse."""
    _check_pair(vr, vi)
    if norm not in ("backward", None):
        raise ValueError(
            f"ifft_large supports norm='backward' or norm=None; got "
            f"{norm!r}")
    from smfft_tpu.ops import fourstep_fused
    from smfft_tpu.ops.fourstep import split_factors
    n = vr.shape[-1]
    if n not in P.SUPPORTED_C2C_SIZES:
        split_factors(n)
    return fourstep_fused.dispatch_planar(
        jnp.asarray(vr, jnp.float32), jnp.asarray(vi, jnp.float32),
        inverse=True, precision=precision,
        scale=1.0 / n if norm == "backward" else 1.0)


def rfft_large(x: jnp.ndarray, precision: str | None = None):
    """Planar huge-N R2C (N = 2**15..2**29): real (..., N) -> packed
    planar half-spectrum pair (..., N/2), slot 0 = (DC, Nyquist).
    Batch-pair pack trick (ops/real_fused.py): two real rows ride as
    the planar re/im planes of one full-length complex FFT row (free
    packing), then one twiddle-free Pallas Hermitian-split pass.
    Unnormalized, matching :func:`rfft`.  Sizes <= 16384 route to
    :func:`rfft`."""
    n = x.shape[-1]
    if n in P.SUPPORTED_REAL_SIZES and n >= 256:
        return rfft(x, precision=precision)
    from smfft_tpu.ops import fourstep, real_fused
    fourstep._check_real_n(n)
    if n < 1 << 15:
        raise ValueError(
            f"Error wrong FFT length! N={n}; planar rfft_large starts "
            f"at 32768 (use rfft below)")
    return real_fused.rfft_large_planar(x, precision=precision)


def irfft_large(vr: jnp.ndarray, vi: jnp.ndarray, n: int | None = None,
                precision: str | None = None,
                norm: str | None = "backward"):
    """Planar huge-N C2R: packed half-spectrum pair (..., N/2) -> real
    (..., N).  ``norm="backward"`` gives the signal (1/(N/2) folded into
    the fused tables); ``norm=None`` keeps the reference's raw scale."""
    _check_pair(vr, vi)
    n = n or vr.shape[-1] * 2
    if norm not in ("backward", None):
        raise ValueError(
            f"irfft_large supports norm='backward' or norm=None; got "
            f"{norm!r}")
    if n in P.SUPPORTED_REAL_SIZES and n >= 256:
        return irfft(vr, vi, n=n, precision=precision, norm=norm)
    from smfft_tpu.ops import fourstep, real_fused
    fourstep._check_real_n(n)
    if n < 1 << 15:
        raise ValueError(f"Error wrong FFT length! N={n}")
    return real_fused.irfft_large_planar(vr, vi, n, precision=precision,
                                         normalize=norm == "backward")


def convolve(vr: jnp.ndarray, vi: jnp.ndarray, hr: jnp.ndarray,
             hi: jnp.ndarray, precision: str | None = None):
    """Planar fused circular convolution: ifft(fft(x) * H) / N in one
    HBM pass.  H = (hr, hi) is the (N,) frequency response in natural
    order."""
    _check_pair(vr, vi)
    n = vr.shape[-1]
    api._check_c2c(n)
    prec = api._resolve_precision(precision)
    from smfft_tpu.ops import convolve as CV
    r, batch = _rows(vr, n)
    i, _ = _rows(vi, n)
    o_r, o_i = CV.convolve_planar(r, i, jnp.asarray(hr), jnp.asarray(hi),
                                  n, precision=prec)
    return o_r.reshape(batch + (n,)), o_i.reshape(batch + (n,))


def fft_any(vr: jnp.ndarray, vi: jnp.ndarray, n: int | None = None,
            precision: str | None = None):
    """Planar arbitrary-length DFT (Bluestein, ops/chirp.py): rows are
    (..., n_pad) with the signal in the first n lanes (n_pad = n rounded
    up to 128); returns the same shape with lanes >= n exactly zero.
    Pass ``n`` when it is not a multiple of 128."""
    _check_pair(vr, vi)
    from smfft_tpu.ops import chirp
    from smfft_tpu import bluestein
    n = n or vr.shape[-1]
    if chirp._n_pad(n) != vr.shape[-1]:
        raise ValueError(f"expected padded row width {chirp._n_pad(n)} "
                         f"for n={n}, got {vr.shape[-1]}")
    prec = api._resolve_precision(precision)
    m = bluestein._conv_length(2 * n - 1)
    np_ = chirp._n_pad(n)
    r, batch = _rows(vr, np_)
    i, _ = _rows(vi, np_)
    o_r, o_i = chirp.bluestein_planar(r, i, n, m, precision=prec)
    return o_r.reshape(batch + (np_,)), o_i.reshape(batch + (np_,))
