"""Stockham autosort family — semantic spec.

Mirrors the contract of the reference's ``do_FFT_Stockham_mk6`` core
(SMFFT_Stockham_C2C/FFT-GPU-32bit-Stockham.cu:97-240) and the
direction-templated ``do_FFT_Stockham_C2C``
(SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:106-266): batched
power-of-two C2C transforms whose output is *always* in natural order — the
autosort dataflow folds the reordering into each stage's scatter, so no
bit-reversal pass exists (reference README.md:33-36).

Implementation here is the textbook iterative Stockham recurrence over an
array A[l, m] = (DFT of length L of the decimated subsequence x[m::M])[l],
doubling L each stage.  It is algebraically the same dataflow as the
reference's j*PoT+k scatter loops (FFT-GPU-32bit-Stockham.cu:146-235),
vectorized over the batch instead of spread over threads.

Quirk parity: the reference's standalone Stockham C2C variant computes only
the positive-exponent (inverse-convention) DFT — its ``Get_W_value`` has a
hard-coded ``+`` sign and is validated against ``CUFFT_INVERSE``
(SMFFT_Stockham_C2C/FFT-GPU-32bit-Stockham.cu:70-78,429).  Pass
``inverse=True`` to reproduce that variant's numbers; the R2C/C2R variant's
direction template corresponds to using both values.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def fft_stockham(x: jnp.ndarray, inverse: bool = False) -> jnp.ndarray:
    """Batched radix-2 Stockham autosort C2C FFT spec (always ordered).

    Args:
      x: complex array (..., N), N a power of two.
      inverse: positive-exponent unnormalized transform if True.
    """
    n = x.shape[-1]
    if n & (n - 1):
        raise ValueError("N must be a power of two")
    sign = +1.0 if inverse else -1.0

    batch_shape = x.shape[:-1]
    a = x.reshape(batch_shape + (1, n))  # (..., L=1, M=N); A[l,m] = x[m]
    length, m = 1, n
    while m > 1:
        even = a[..., :, : m // 2]          # subsequences x[m::M] (even half)
        odd = a[..., :, m // 2:]            # subsequences x[m+M/2::M]
        k = np.arange(length)
        w = np.exp(sign * 2j * np.pi * k / (2 * length)).astype(np.complex64)
        t = w[..., :, None] * odd
        a = jnp.concatenate([even + t, even - t], axis=-2)
        length, m = 2 * length, m // 2
    return a.reshape(batch_shape + (n,))
