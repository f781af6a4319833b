"""R2C / C2R transforms on the Pallas C2C core — half-size packing trick.

Mirrors the reference's ``do_FFT_Stockham_R2C_C2R``
(SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344): a real
transform of length N runs as a half-size (L = N/2) complex transform on
packed (even, odd) samples plus a split/merge post-process with W(N, k)
twiddles (:289-328); element 0 packs (DC, Nyquist) into one complex slot
(:332-340); the C2R inverse is unnormalized — it returns (N/2)*x
(cf. FFT.c:170-171).

v1 structure: the hot half-size C2C runs in the fused Pallas kernel; the
pack (even/odd deinterleave) and split/merge recombination are XLA
elementwise/roll passes around it.  (A planned optimization folds the
mirror Z[(L-k) mod L] into a second lane matmul and the deinterleave into
within-tile gathers, making R2C a single fused kernel.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smfft_tpu import params as P
from smfft_tpu.ops import pallas_c2c as PC


def _split_forward(zf: jnp.ndarray, n: int, packed: bool) -> jnp.ndarray:
    """Recombine the half-size spectrum (natural order) into the real
    spectrum; same math as models.real._split_forward (kept separate so the
    ops path has no spec dependency)."""
    L = n // 2
    zrev = jnp.roll(jnp.flip(zf, axis=-1), 1, axis=-1)
    e = 0.5 * (zf + jnp.conj(zrev))
    o = -0.5j * (zf - jnp.conj(zrev))
    c_t, s_t = P.real_split_twiddles(n)
    w = jnp.asarray(c_t) + 1j * jnp.asarray(s_t)
    full = e + w * o
    dc = jnp.real(zf[..., :1]) + jnp.imag(zf[..., :1])
    nyq = jnp.real(zf[..., :1]) - jnp.imag(zf[..., :1])
    if packed:
        return jnp.concatenate([dc + 1j * nyq, full[..., 1:]], axis=-1)
    return jnp.concatenate([dc + 0j, full[..., 1:], nyq + 0j], axis=-1)


def _merge_inverse(spec: jnp.ndarray, n: int, packed: bool) -> jnp.ndarray:
    L = n // 2
    if packed:
        dc = jnp.real(spec[..., :1])
        nyq = jnp.imag(spec[..., :1])
        x_half = jnp.concatenate([dc + 0j, spec[..., 1:]], axis=-1)
    else:
        dc = jnp.real(spec[..., :1])
        nyq = jnp.real(spec[..., L:L + 1])
        x_half = jnp.concatenate([dc + 0j, spec[..., 1:L]], axis=-1)
    body = x_half[..., 1:]
    mirror = jnp.concatenate([nyq + 0j, jnp.flip(body, axis=-1)], axis=-1)
    c_t, s_t = P.real_split_twiddles(n)
    winv = jnp.asarray(c_t) - 1j * jnp.asarray(s_t)  # conjugate
    e = 0.5 * (x_half + jnp.conj(mirror))
    o = 0.5 * (x_half - jnp.conj(mirror)) * winv
    return e + 1j * o


def rfft_pallas(x: jnp.ndarray, precision: str = "highest",
                packed: bool = False) -> jnp.ndarray:
    """Batched R2C: real (..., N) -> complex (..., N/2+1) numpy layout or
    (..., N/2) packed reference layout."""
    n = x.shape[-1]
    if n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(f"Error wrong FFT length! N={n}")
    L = n // 2
    pairs = x.reshape(x.shape[:-1] + (L, 2)).astype(jnp.float32)
    z = jax.lax.complex(pairs[..., 0], pairs[..., 1])
    zf = PC.fft_pallas(z, ordered=True, precision=precision)
    return _split_forward(zf, n, packed)


def irfft_pallas(spec: jnp.ndarray, n: int, precision: str = "highest",
                 packed: bool = False) -> jnp.ndarray:
    """Batched C2R inverse; returns the reference's raw (N/2)-scaled real
    signal (callers normalize)."""
    if n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(f"Error wrong FFT length! N={n}")
    z = _merge_inverse(spec, n, packed)
    zi = PC.fft_pallas(z, inverse=True, ordered=True, precision=precision)
    out = jnp.stack([jnp.real(zi), jnp.imag(zi)], axis=-1)
    return out.reshape(spec.shape[:-1] + (n,))
