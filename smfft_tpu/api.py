"""Public API — batched FFT entry points with static size dispatch.

The analogue of the reference's L3 host-driver interface
(GPU_smFFT_4elements / GPU_FFT_C2C_Stockham / GPU_smFFT_R2C / GPU_smFFT_C2R,
SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:827-908,
SMFFT_Stockham_C2C/FFT-GPU-32bit-Stockham.cu:457-530,
SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:572-688) plus its 32-case
static dispatch switch (FFT-GPU-32bit.cu:599-659): unsupported sizes raise
(the reference prints "Error wrong FFT length!", :656-658).

Backends:
  * ``backend="pallas"`` (default on TPU) — the fused single-HBM-pass VMEM
    kernel, the product path.
  * ``backend="xla"`` — the jnp-level mixed-radix MXU engine; runs on any
    JAX backend (CPU included) and is the fallback where Pallas TPU kernels
    are unavailable.
  * ``backend="spec"`` — the pure-jnp radix-2 semantic specification
    (models/), for debugging and cross-checking.

Normalization follows numpy: ``ifft`` divides by N, ``irfft`` by N, unless
``norm=None`` which gives the reference's raw unnormalized transforms
(the reference never normalizes an inverse; SURVEY.md quirk 3).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

from smfft_tpu import params as P
from smfft_tpu.models import cooley_tukey, real as real_model
from smfft_tpu.ops import matmul_fft

Backend = Literal["pallas", "xla", "spec", "auto"]


def _resolve_backend(backend: Backend) -> str:
    if backend != "auto":
        return backend
    return "pallas" if jax.default_backend() == "tpu" else "xla"


_warned_precisions: set[str] = set()

#: MXU precision tiers (see ops/pallas_c2c.py for the pass schemes):
#:   "exact"   — tightest fp32: "highest" products + the 128-term lane
#:               contraction split into 16 sub-dots on a pairwise fp32
#:               add tree; ~2.5x lower error than "highest" at
#:               N >= 1024 (~1.6 output ulp — the fp32 floor; measured
#:               table in BASELINE.md).
#:   "highest" — numpy-grade fp32 (6 bf16 MXU passes); the default.
#:   "high"    — meets the reference's 1e-4 verification gate (FFT.c:12)
#:               at every supported size at reduced MXU cost.
#:   "fast"    — bf16x3 throughput mode; OUTSIDE the 1e-4 absolute gate
#:               for N >= 256 (max abs err ~4e-4 at N=4096) — benchmark /
#:               throughput use only.
#:   "default" — single bf16 pass; UNUSABLE accuracy (max abs err ~0.1-0.2
#:               at N >= 1024), kept only as a hardware-parity knob.
#:               Requesting it emits a UserWarning.


def _resolve_precision(precision: str | None) -> str:
    """None -> the process-level default (config.flags.precision, the
    SMFFT_PRECISION analogue of the reference's debug.h compile flags)."""
    if precision is None:
        from smfft_tpu.config import flags
        precision = flags.precision
    if precision == "default" and precision not in _warned_precisions:
        import warnings
        _warned_precisions.add(precision)
        warnings.warn(
            "precision='default' is a single-bf16-pass hardware-parity "
            "knob with UNUSABLE accuracy (max abs err ~0.1-0.2 at "
            "N >= 1024; see BENCH_DETAILS.json). Use 'highest' "
            "(numpy-grade), 'high' (1e-4 gate at reduced cost), or "
            "'fast' (throughput mode, outside the 1e-4 gate for N >= "
            "256).", UserWarning, stacklevel=3)
    return precision


def _check_c2c(n: int):
    if n not in P.SUPPORTED_C2C_SIZES:
        raise ValueError(
            f"Error wrong FFT length! N={n}; supported: {P.SUPPORTED_C2C_SIZES}")


def _c2c(x: jnp.ndarray, inverse: bool, ordered: bool, backend: str,
         precision: str | None) -> jnp.ndarray:
    n = x.shape[-1]
    _check_c2c(n)
    precision = _resolve_precision(precision)
    # resolve the static plan once — the L0 dispatch spine; every backend
    # below specializes on it (the reference's 32-case template switch,
    # FFT-GPU-32bit.cu:599-659)
    plan = P.plan_for(n, "inverse" if inverse else "forward", "c2c", ordered)
    backend = _resolve_backend(backend)
    if backend == "spec":
        return cooley_tukey.fft_dit(x, inverse=inverse, ordered=plan.ordered)
    if backend == "pallas":
        from smfft_tpu.ops import pallas_c2c
        return pallas_c2c.fft_pallas(x, precision=precision, plan=plan)
    return matmul_fft.fft_matmul(x, inverse=inverse, ordered=plan.ordered,
                                 radices=plan.radices, precision=precision)


# ---------------------------------------------------------------------------
# Differentiability.  The Pallas kernels have no AD rules, so the public
# ordered transforms carry custom VJPs (spectral layers / learned filters
# train THROUGH the fused kernels at kernel speed).  The DFT matrix is
# symmetric, so the reverse-mode rule of either c2c direction is the SAME
# transform applied to the cotangent; the real-transform rules carry the
# Hermitian half-spectrum weights.  All four rules are verified against
# jax.numpy.fft's VJPs in tests/test_autodiff.py.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _diff_c2c(inverse: bool, backend: str, precision: str | None,
              norm_div: bool):
    """custom_vjp-wrapped ordered C2C (vjp(g) = the same transform of g,
    for both directions and either normalization — F^T = F)."""

    @jax.custom_vjp
    def f(x):
        out = _c2c(x, inverse=inverse, ordered=True, backend=backend,
                   precision=precision)
        return out / x.shape[-1] if norm_div else out

    f.defvjp(lambda x: (f(x), None), lambda _, g: (f(g),))
    return f


@functools.lru_cache(maxsize=None)
def _diff_rfft(backend: str, precision: str | None, packed: bool):
    """custom_vjp-wrapped R2C: vjp(g) = n * irfft(conj(g) * s), with
    s = [1, 1/2, ..., 1/2, 1] halving the double-counted interior bins
    (real cotangent, matching jnp.fft.rfft)."""

    @jax.custom_vjp
    def f(x):
        return (_rfft_impl(x, backend, precision, True) if packed
                else _rfft_impl(x, backend, precision, False))

    def bwd(_, g):
        if packed:
            raise NotImplementedError(
                "fft_packed_real has no VJP (packed slot-0 layout); "
                "differentiate rfft instead")
        n = (g.shape[-1] - 1) * 2
        s = np.concatenate([[1.0], np.full(n // 2 - 1, 0.5), [1.0]]
                           ).astype(np.float32)
        gx = irfft(jnp.conj(g) * s, n=n, backend=backend,
                   precision=precision, norm="backward") * np.float32(n)
        return (gx,)

    f.defvjp(lambda x: (f(x), None), bwd)
    return f


@functools.lru_cache(maxsize=None)
def _diff_irfft(n: int, backend: str, precision: str | None,
                norm_div: bool):
    """custom_vjp-wrapped C2R (numpy layout): vjp(g) = conj(rfft(g)) * d
    / n, d = [1, 2, ..., 2, 1] (and * n/2 instead of /1 when the raw
    unnormalized contract is in effect)."""

    @jax.custom_vjp
    def f(x):
        return _irfft_impl(x, n, backend, precision, norm_div)

    def bwd(_, g):
        d = np.concatenate([[1.0], np.full(n // 2 - 1, 2.0), [1.0]]
                           ).astype(np.float32)
        scale = np.float32(1.0 / n) if norm_div else np.float32(0.5)
        gs = jnp.conj(rfft(g, backend=backend, precision=precision))
        return (gs * (d * scale),)

    f.defvjp(lambda x: (f(x), None), bwd)
    return f


@functools.lru_cache(maxsize=None)
def _diff_large_c2c(inverse: bool, backend: str, precision: str | None,
                    norm_div: bool):
    """custom_vjp-wrapped huge-N C2C (ADVICE r4: the fused Pallas
    multi-pass kernels have no AD rules, so jax.grad through
    fft_large/ifft_large raised on the pallas backend).  The DFT matrix
    is symmetric, so vjp(g) is the SAME transform of g for either
    direction and normalization."""

    @jax.custom_vjp
    def f(x):
        from smfft_tpu.ops import fourstep
        return fourstep.fft_four_step(
            x, inverse=inverse, backend=backend, precision=precision,
            scale=1.0 / x.shape[-1] if norm_div else 1.0)

    f.defvjp(lambda x: (f(x), None), lambda _, g: (f(g),))
    return f


@functools.lru_cache(maxsize=None)
def _diff_rfft_large(backend: str, precision: str | None, packed: bool):
    """custom_vjp-wrapped huge-N R2C — same rule as :func:`_diff_rfft`:
    vjp(g) = n * irfft_large(conj(g) * s)."""

    @jax.custom_vjp
    def f(x):
        from smfft_tpu.ops import fourstep
        return fourstep.rfft_four_step(x, packed=packed, backend=backend,
                                       precision=precision)

    def bwd(_, g):
        if packed:
            raise NotImplementedError(
                "packed rfft_large has no VJP (packed slot-0 layout); "
                "differentiate rfft_large(packed=False) instead")
        n = (g.shape[-1] - 1) * 2
        s = np.concatenate([[1.0], np.full(n // 2 - 1, 0.5), [1.0]]
                           ).astype(np.float32)
        gx = irfft_large(jnp.conj(g) * s, n=n, backend=backend,
                         precision=precision,
                         norm="backward") * np.float32(n)
        return (gx,)

    f.defvjp(lambda x: (f(x), None), bwd)
    return f


@functools.lru_cache(maxsize=None)
def _diff_irfft_large(n: int, backend: str, precision: str | None,
                      norm_div: bool):
    """custom_vjp-wrapped huge-N C2R (numpy layout) — same rule as
    :func:`_diff_irfft`: vjp(g) = conj(rfft_large(g)) * d * scale."""

    @jax.custom_vjp
    def f(x):
        from smfft_tpu.ops import fourstep
        return fourstep.irfft_four_step(x, n, packed=False,
                                        backend=backend,
                                        precision=precision,
                                        normalize=norm_div)

    def bwd(_, g):
        d = np.concatenate([[1.0], np.full(n // 2 - 1, 2.0), [1.0]]
                           ).astype(np.float32)
        scale = np.float32(1.0 / n) if norm_div else np.float32(0.5)
        gs = jnp.conj(rfft_large(g, backend=backend, precision=precision))
        return (gs * (d * scale),)

    f.defvjp(lambda x: (f(x), None), bwd)
    return f


def fft(x: jnp.ndarray, ordered: bool = True, backend: Backend = "auto",
        precision: str | None = None) -> jnp.ndarray:
    """Batched forward C2C FFT over the last axis.

    Args:
      x: complex64 (..., N), N in {32..4096} powers of two.
      ordered: natural-order output (reference ``fft_reorder=1``); False
        returns digit-reversed output at lower cost (``fft_reorder=0``).
      backend: "auto" | "pallas" | "xla" | "spec".
      precision: MXU precision tier — "highest" (numpy-grade, default) |
        "exact" (tightest fp32, ~1.6 output ulp at N >= 1024) | "high"
        (1e-4 gate, cheaper) | "fast" (throughput-only, outside the
        1e-4 gate for N >= 256) | "default" (parity knob, unusable
        accuracy — warns).  See the tier notes above _resolve_precision.

    Ordered transforms are differentiable (custom VJP through the fused
    kernel); ``ordered=False`` is not (the revblock layout's VJP would
    need an un-permutation pass — use the ordered form in training code).
    """
    if ordered:
        return _diff_c2c(False, backend, precision, False)(x)
    return _c2c(x, inverse=False, ordered=False, backend=backend,
                precision=precision)


def ifft(x: jnp.ndarray, ordered: bool = True, backend: Backend = "auto",
         precision: str | None = None, norm: str | None = "backward") -> jnp.ndarray:
    """Batched inverse C2C FFT. ``norm="backward"`` divides by N (numpy
    semantics); ``norm=None`` matches the reference's unnormalized inverse.
    Differentiable when ``ordered=True``."""
    if ordered:
        return _diff_c2c(True, backend, precision, norm == "backward")(x)
    out = _c2c(x, inverse=True, ordered=False, backend=backend,
               precision=precision)
    if norm == "backward":
        out = out / x.shape[-1]
    return out


def ifft_unordered(x: jnp.ndarray, backend: Backend = "auto",
                   precision: str | None = None,
                   norm: str | None = "backward") -> jnp.ndarray:
    """Inverse C2C FFT consuming the revblock layout that
    ``fft(ordered=False)`` produces, returning natural order in ONE fused
    pass — the relayout-free convolution-roundtrip pair (the reference's
    fft_reorder=0 use case, README.md:30-33).  On non-TPU backends this
    falls back to un-permuting + the XLA engine.

    Each backend consumes the unordered layout its own forward produces
    (pallas: revblock; xla: factorization digit-reversed; spec:
    bit-reversed) so fft(ordered=False) |> ifft_unordered round-trips on
    any backend; only the pallas pair is relayout-free.
    """
    n = x.shape[-1]
    _check_c2c(n)
    precision = _resolve_precision(precision)
    backend = _resolve_backend(backend)
    if backend == "pallas":
        from smfft_tpu.ops import pallas_c2c
        out = pallas_c2c.ifft_pallas_rev(x, precision=precision)
    elif backend == "spec":
        perm = cooley_tukey.bit_reverse_indices(n)
        out = cooley_tukey.fft_dit(x[..., perm], inverse=True)
    else:
        perm = matmul_fft.digit_reverse_indices(n, P.get_factorization(n))
        out = matmul_fft.fft_matmul(x[..., perm], inverse=True,
                                    precision=precision)
    if norm == "backward":
        out = out / n
    return out


@functools.lru_cache(maxsize=None)
def _diff_convolve(bank: bool, real: bool, backend: str,
                   precision: str | None):
    """custom_vjp over the fused convolution kernels: forward runs the
    single-HBM-pass kernel; backward differentiates the mathematically
    identical unfused composition (whose transforms carry their own
    custom VJPs above), yielding cotangents for BOTH the signal batch
    and the filter response (learned spectral filters)."""

    def unfused(x_, h_):
        n = x_.shape[-1]
        if real:
            spec = rfft(x_, backend=backend, precision=precision)
            bins = n // 2 + 1
        else:
            spec = fft(x_, backend=backend, precision=precision)
            bins = n
        if bank:
            spec = spec[None] * h_.reshape((h_.shape[0],)
                                           + (1,) * (x_.ndim - 1) + (bins,))
        else:
            spec = spec * h_
        if real:
            return irfft(spec, n=n, backend=backend, precision=precision)
        return ifft(spec, backend=backend, precision=precision)

    @jax.custom_vjp
    def f(x, h):
        return (_convolve_real_impl if real else _convolve_impl)(
            x, h, backend, precision)

    def bwd(res, g):
        x, h = res
        _, pullback = jax.vjp(unfused, x, h)
        return pullback(g)

    f.defvjp(lambda x, h: (f(x, h), (x, h)), bwd)
    return f


def convolve(x: jnp.ndarray, h: jnp.ndarray, backend: Backend = "auto",
             precision: str | None = None) -> jnp.ndarray:
    """Batched circular convolution via the spectral theorem:
    ``ifft(fft(x) * h) / N``.

    Args:
      x: complex64 (..., N) signal batch, N a supported C2C size.
      h: complex64 (N,) filter FREQUENCY response in natural order
        (compute once with ``fft(h_time)``) — or an (M, N) bank of
        responses, returning (M, ..., N): every signal convolved with
        every template (the matched-filtering shape; the forward FFT of
        each signal is computed ONCE for the whole bank, in-kernel).
      backend / precision: as :func:`fft`.

    On the pallas backend the forward FFT, the spectral multiply, and the
    inverse FFT run in ONE fused kernel — a single HBM read+write of the
    signal, with the spectrum living only in VMEM in the internal
    revblock layout (the relayout-free kernel A/B composition the
    reference advertises its ``__device__`` cores for,
    reference README.md:10,30-33).  Other backends fall back to the
    three-step ordered composition.
    """
    n = x.shape[-1]
    _check_c2c(n)
    bank = h.ndim == 2
    if h.shape != (n,) and not (bank and h.shape[-1] == n):
        raise ValueError(f"filter must be natural-order frequency response "
                         f"of shape ({n},) or (M, {n}), got {h.shape}")
    return _diff_convolve(bank, False, backend, precision)(x, h)


def _convolve_impl(x: jnp.ndarray, h: jnp.ndarray, backend: str,
                   precision: str | None) -> jnp.ndarray:
    n = x.shape[-1]
    bank = h.ndim == 2
    precision = _resolve_precision(precision)
    backend = _resolve_backend(backend)
    if backend == "pallas":
        from smfft_tpu.ops import convolve as conv_ops
        if bank:
            return conv_ops.convolve_bank_pallas(x, h, precision=precision)
        return conv_ops.convolve_pallas(x, h, precision=precision)
    spec = _c2c(x, inverse=False, ordered=True, backend=backend,
                precision=precision)
    if bank:
        spec = spec[None] * h.reshape((h.shape[0],) + (1,) * (x.ndim - 1)
                                      + (n,))
    else:
        spec = spec * h
    out = _c2c(spec, inverse=True, ordered=True, backend=backend,
               precision=precision)
    return out / n


def convolve_real(x: jnp.ndarray, h: jnp.ndarray,
                  backend: Backend = "auto",
                  precision: str | None = None) -> jnp.ndarray:
    """Batched REAL circular convolution: real signals against a real
    filter's rfft-style response, at half the traffic of :func:`convolve`.

    Args:
      x: float32 (..., N) real signal batch, N >= 256 a supported real
        size.
      h: complex64 (N/2+1,) filter frequency response in natural order
        (compute once with ``rfft(h_time)``; DC/Nyquist imaginary parts
        are ignored — they are zero for any real filter) — or an
        (M, N/2+1) bank of responses, returning (M, ..., N) with each
        signal's r2c computed once for the whole bank in-kernel.

    On the pallas backend this is r2c -> half-spectrum multiply -> c2r
    in ONE fused kernel: N real samples cross HBM once each way and the
    packed half spectrum lives only in VMEM (the r2c and c2r cores pair
    with zero relayout).  Other backends fall back to the three-step
    rfft/irfft composition.
    """
    n = x.shape[-1]
    if n not in P.SUPPORTED_REAL_SIZES or n < 256:
        raise ValueError(
            f"Error wrong FFT length! N={n}; real convolve supports "
            f"{[s for s in P.SUPPORTED_REAL_SIZES if s >= 256]}")
    bank = h.ndim == 2
    if h.shape != (n // 2 + 1,) and not (bank and h.shape[-1] == n // 2 + 1):
        raise ValueError(f"filter must be an rfft-style frequency response "
                         f"of shape ({n // 2 + 1},) or (M, {n // 2 + 1}), "
                         f"got {h.shape}")
    return _diff_convolve(bank, True, backend, precision)(x, h)


def _convolve_real_impl(x: jnp.ndarray, h: jnp.ndarray, backend: str,
                        precision: str | None) -> jnp.ndarray:
    n = x.shape[-1]
    bank = h.ndim == 2
    precision = _resolve_precision(precision)
    backend = _resolve_backend(backend)
    if backend == "pallas":
        from smfft_tpu.ops import convolve as conv_ops
        if bank:
            return conv_ops.convolve_real_bank_pallas(x, h,
                                                      precision=precision)
        return conv_ops.convolve_real_pallas(x, h, precision=precision)
    spec = rfft(x, backend=backend, precision=precision)
    if bank:
        spec = spec[None] * h.reshape((h.shape[0],) + (1,) * (x.ndim - 1)
                                      + (n // 2 + 1,))
    else:
        spec = spec * h
    return irfft(spec, n=n, backend=backend, precision=precision)


def fft_large(x: jnp.ndarray, backend: Backend = "auto",
              precision: str | None = None) -> jnp.ndarray:
    """Forward C2C FFT for huge power-of-two N (2**15..2**28), batched
    over leading axes — sizes beyond the single-row-kernel cap (the
    reference stops at 4096, FFT-GPU-32bit.cu:656-658; the row kernels
    here stop at 16384).  Runs the four-step decomposition
    (ops/fourstep.py): two batches of fused row transforms glued by one
    exact twiddle multiply.  Sizes <= 16384 route to :func:`fft`."""
    n = x.shape[-1]
    if n in P.SUPPORTED_C2C_SIZES:
        return fft(x, backend=backend, precision=precision)
    return _diff_large_c2c(False, _resolve_backend(backend),
                           precision, False)(x)


def ifft_large(x: jnp.ndarray, backend: Backend = "auto",
               precision: str | None = None,
               norm: str | None = "backward") -> jnp.ndarray:
    """Inverse of :func:`fft_large`.  ``norm="backward"`` divides by N
    (numpy); ``norm=None`` is the reference's raw unnormalized inverse."""
    if norm not in ("backward", None):
        raise ValueError(
            f"ifft_large supports norm='backward' (numpy) or norm=None "
            f"(raw reference scale); got {norm!r}")
    n = x.shape[-1]
    if n in P.SUPPORTED_C2C_SIZES:
        return ifft(x, backend=backend, precision=precision, norm=norm)
    return _diff_large_c2c(True, _resolve_backend(backend), precision,
                           norm == "backward")(x)


def rfft_large(x: jnp.ndarray, backend: Backend = "auto",
               precision: str | None = None,
               packed: bool = False) -> jnp.ndarray:
    """R2C FFT for huge power-of-two N (2**15..2**29): the reference's
    half-size pack trick (SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-
    Stockham.cu:269-344) applied at four-step scale (ops/fourstep.py).
    Sizes <= 16384 route to :func:`rfft` / :func:`fft_packed_real`."""
    n = x.shape[-1]
    if n in P.SUPPORTED_REAL_SIZES:
        # route through the public wrappers so the custom-VJP autodiff
        # path is identical to rfft/fft_packed_real (ADVICE r3)
        if packed:
            return fft_packed_real(x, backend=backend, precision=precision)
        return rfft(x, backend=backend, precision=precision)
    return _diff_rfft_large(_resolve_backend(backend), precision,
                            packed)(x)


def irfft_large(x: jnp.ndarray, n: int | None = None,
                backend: Backend = "auto", precision: str | None = None,
                norm: str | None = "backward",
                packed: bool = False) -> jnp.ndarray:
    """Inverse of :func:`rfft_large`.  ``norm="backward"`` returns the
    signal (numpy); ``norm=None`` keeps the reference's raw (N/2)-scaled
    output (SMFFT_Stockham_R2C_C2R/FFT.c:170-171)."""
    if norm not in ("backward", None):
        raise ValueError(
            f"irfft_large supports norm='backward' (numpy) or norm=None "
            f"(raw reference scale); got {norm!r}")
    if n is None:
        n = (x.shape[-1] - 1) * 2 if not packed else x.shape[-1] * 2
    if n in P.SUPPORTED_REAL_SIZES:
        return irfft(x, n=n, backend=backend, precision=precision,
                     norm=norm, packed=packed)
    if packed:
        # packed slot-0 layout has no VJP contract (matches irfft's
        # packed behavior) — call the op directly
        from smfft_tpu.ops import fourstep
        return fourstep.irfft_four_step(x, n, packed=True,
                                        backend=backend,
                                        precision=precision,
                                        normalize=norm == "backward")
    return _diff_irfft_large(n, _resolve_backend(backend), precision,
                             norm == "backward")(x)


def _rfft_impl(x: jnp.ndarray, backend: str, precision: str | None,
               packed: bool) -> jnp.ndarray:
    n = x.shape[-1]
    if n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(
            f"Error wrong FFT length! N={n}; supported: {P.SUPPORTED_REAL_SIZES}")
    precision = _resolve_precision(precision)
    backend = _resolve_backend(backend)
    if backend == "spec":
        return real_model.rfft_spec(x, packed=packed)
    if backend == "pallas":
        from smfft_tpu.ops import pallas_real
        if n >= 256:
            # fully-fused single-pass kernel
            return pallas_real.rfft_pallas_fused(x, precision=precision,
                                                 packed=packed)
        return pallas_real.rfft_pallas(x, precision=precision, packed=packed)
    z = real_model.pack_real(x)
    zf = matmul_fft.fft_matmul(z, precision=precision)
    return real_model._split_forward(zf, n, packed=packed)


def rfft(x: jnp.ndarray, backend: Backend = "auto",
         precision: str | None = None) -> jnp.ndarray:
    """Batched R2C FFT: real (..., N) -> complex (..., N/2+1), numpy
    layout.  Differentiable (custom VJP through the fused kernel)."""
    return _diff_rfft(backend, precision, False)(x)


def fft_packed_real(x: jnp.ndarray, backend: Backend = "auto",
                    precision: str | None = None) -> jnp.ndarray:
    """R2C in the reference's packed layout: (..., N/2) complex with
    out[..., 0] = DC + 1j*Nyquist (FFT-GPU-32bit-Stockham.cu:332-340)."""
    return _rfft_impl(x, backend, precision, True)


def irfft(x: jnp.ndarray, n: int | None = None, backend: Backend = "auto",
          precision: str | None = None, norm: str | None = "backward",
          packed: bool = False) -> jnp.ndarray:
    """Batched C2R inverse FFT: complex spectrum -> real (..., N).

    ``norm="backward"`` divides by N (numpy); ``norm=None`` returns the
    reference's raw (N/2)-scaled output
    (SMFFT_Stockham_R2C_C2R/FFT.c:170-171).  The numpy-layout form
    (``packed=False``) is differentiable (custom VJP through the fused
    kernel)."""
    if n is None:
        n = (x.shape[-1] - 1) * 2 if not packed else x.shape[-1] * 2
    if n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(f"Error wrong FFT length! N={n}")
    if not packed:
        return _diff_irfft(n, backend, precision, norm == "backward")(x)
    return _irfft_impl_packed(x, n, backend, precision,
                              norm == "backward")


def _irfft_impl(x: jnp.ndarray, n: int, backend: str,
                precision: str | None, norm_div: bool) -> jnp.ndarray:
    """Numpy-layout C2R body (called under the custom_vjp wrapper)."""
    return _irfft_common(x, n, backend, precision, norm_div, False)


def _irfft_impl_packed(x, n, backend, precision, norm_div):
    return _irfft_common(x, n, backend, precision, norm_div, True)


def _irfft_common(x: jnp.ndarray, n: int, backend: str,
                  precision: str | None, norm_div: bool,
                  packed: bool) -> jnp.ndarray:
    precision = _resolve_precision(precision)
    backend = _resolve_backend(backend)
    if backend == "spec":
        out = real_model.irfft_spec(x, n, packed=packed, normalize=False)
    elif backend == "pallas":
        from smfft_tpu.ops import pallas_real
        if n >= 256:
            # fused C2R on the natural packed spectrum; the natural ->
            # revblock conversion happens in-kernel (digit_swap_split),
            # so there is no XLA relayout pass
            L = n // 2
            b = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
            # build the packed planar halves directly from real/imag —
            # `f32 + 1j*f32` would lower to f32->c64 converts, which the
            # axon TPU backend rejects (UNIMPLEMENTED at readback)
            if packed:
                pk_r = jnp.real(x).reshape(b, L)
                pk_i = jnp.imag(x).reshape(b, L)
            else:
                xr = jnp.real(x).reshape(b, L + 1)
                xi = jnp.imag(x).reshape(b, L + 1)
                pk_r = xr[:, :L]
                pk_i = jnp.concatenate([xr[:, L:L + 1], xi[:, 1:L]], axis=-1)
            out = pallas_real.irfft_fused_planar(
                pk_r, pk_i, n,
                precision=precision, in_natural=True,
            ).reshape(x.shape[:-1] + (n,))
        else:
            out = pallas_real.irfft_pallas(x, n, precision=precision,
                                           packed=packed)
    else:
        z = real_model._merge_inverse(x, n, packed=packed)
        zi = matmul_fft.fft_matmul(z, inverse=True, precision=precision)
        out = jnp.stack([jnp.real(zi), jnp.imag(zi)], axis=-1).reshape(
            x.shape[:-1] + (n,))
    if norm_div:
        # the raw half-size-inverse output is (N/2)-scaled, so this yields x
        out = out / (n // 2)
    return out
