"""Linear (streaming) convolution on top of the fused circular kernels.

The reference library's home pipeline exists to filter LONG sampled
streams with short kernels (reference README.md:10 — "convolution via
shared-memory FFTs"); the circular transforms are the building block,
overlap-save is the standard framing that turns them into linear
convolution.  This module is that framing, TPU-style: the stream is
framed into a BATCH of overlapping rows (one XLA gather), the whole
batch runs through ONE fused convolve kernel (FFT -> multiply -> iFFT
in a single HBM pass, ops/convolve.py), and the valid regions are
stitched back (one reshape + slice).

``fftconvolve(x, h)`` matches ``numpy.convolve(x, h)`` ("full" mode)
/ scipy.signal.fftconvolve semantics for 1-D signals and batches.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from smfft_tpu import params as P


def _pick_nfft(k: int) -> int:
    """Smallest supported FFT size with hop >= 3/4 n (so the per-frame
    K-1 overlap re-read stays under a third of the stream traffic)."""
    for n in P.SUPPORTED_C2C_SIZES:
        if n >= 256 and n - k + 1 >= (3 * n) // 4:
            return n
    raise ValueError(
        f"filter too long for overlap-save: K={k} needs 4*(K-1) <= "
        f"{P.SUPPORTED_C2C_SIZES[-1]}")


def fftconvolve(x: jnp.ndarray, h: jnp.ndarray, mode: str = "full",
                n_fft: int | None = None, backend: str = "auto",
                precision: str | None = None) -> jnp.ndarray:
    """Linear convolution of (batched) signals with a short filter via
    overlap-save over the fused circular-convolution kernel.

    Args:
      x: (T,) or (B, T) signal(s) — float32 for the real path (half the
        traffic), complex64 for the complex path.
      h: (K,) time-domain filter taps (real for the real path).
      mode: "full" (T+K-1 outputs, numpy.convolve default), "same"
        (T, centered) or "valid" (T-K+1).
      n_fft: FFT frame length override; default picks the smallest
        supported size with at least 3/4 useful hop.
      backend / precision: forwarded to the convolve kernels.

    Every frame rides the single-HBM-pass fused kernel; the framing
    gather and the output stitch are one XLA op each.
    """
    from smfft_tpu import api

    if mode not in ("full", "same", "valid"):
        raise ValueError(f"mode must be full|same|valid, got {mode!r}")
    k = int(h.shape[-1])
    if h.ndim != 1:
        raise ValueError(f"filter must be 1-D taps, got shape {h.shape}")
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    if x.ndim != 2:
        raise ValueError(f"signal must be (T,) or (B, T), got {x.shape}")
    b, t = x.shape
    n = n_fft or _pick_nfft(k)
    if n not in P.SUPPORTED_C2C_SIZES or n < 256 or k >= n:
        raise ValueError(f"n_fft={n} unsupported or not longer than the "
                         f"filter (K={k})")
    hop = n - k + 1
    full_len = t + k - 1
    frames = -(-full_len // hop)

    real = (not jnp.iscomplexobj(x)) and (not jnp.iscomplexobj(h))
    # overlap-save: frame f covers padded positions [f*hop, f*hop + n);
    # left-pad K-1 (linear-conv warmup), right-pad to the frame grid
    pad_r = (frames - 1) * hop + n - (k - 1) - t
    dt = x.dtype if real else jnp.complex64
    xp = jnp.concatenate(
        [jnp.zeros((b, k - 1), dt), x.astype(dt),
         jnp.zeros((b, max(0, pad_r)), dt)], axis=-1)
    idx = (np.arange(frames)[:, None] * hop
           + np.arange(n)[None, :])               # (F, n) static indices
    fx = xp[:, idx]                               # (B, F, n) one gather
    fx = fx.reshape(b * frames, n)

    if real:
        hf = api.rfft(_pad_taps(h, n, real=True),
                      backend=backend, precision=precision)[0]
        y = api.convolve_real(fx, hf, backend=backend, precision=precision)
    else:
        hf = api.fft(_pad_taps(h, n, real=False), backend=backend,
                     precision=precision)[0]
        y = api.convolve(fx, hf, backend=backend, precision=precision)
    # per-frame valid region: circular positions [K-1, n) are the linear
    # convolution outputs for stream positions f*hop .. f*hop + hop - 1
    y = y.reshape(b, frames, n)[:, :, k - 1:]     # (B, F, hop)
    y = y.reshape(b, frames * hop)[:, :full_len]
    if mode == "same":
        start = (k - 1) // 2
        y = y[:, start:start + t]
    elif mode == "valid":
        y = y[:, k - 1:t]
    return y[0] if squeeze else y


def _pad_taps(h: jnp.ndarray, n: int, real: bool) -> jnp.ndarray:
    dt = jnp.float32 if real else jnp.complex64
    return jnp.concatenate(
        [h.astype(dt), jnp.zeros((n - h.shape[-1],), dt)])[None, :]
