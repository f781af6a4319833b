"""Fused spectral convolution: FFT -> filter multiply -> inverse FFT in
ONE Pallas kernel (a single HBM pass).

This is the product form of the reference's entire reason for the
``fft_reorder=0`` mode: SMFFT exists to feed convolution pipelines where
the intermediate spectrum never needs natural order (reference
README.md:10,30-33 — the ``__device__``-composable cores are advertised
exactly so a user kernel can do FFT -> filter -> iFFT without leaving
shared memory).  On a GPU that composition still spans a kernel the user
must write; here it ships as an API:

    out = ifft(fft(x) * H) / N        (circular convolution theorem)

with the forward core, the spectral multiply, and the inverse core all
inside one ``pallas_call`` — the signal tile is read from HBM once and
the result written once, so the whole convolution runs at the streaming
roofline of a single FFT (the spectrum lives only in VMEM, in revblock
layout, where the relayout-free kernel A/B pair composes for free).

The filter is a frequency response H given in NATURAL order (compute it
once with ``fft(h_time)``); it is re-indexed host-side into the kernel's
internal revblock layout and the 1/N inverse normalization is folded
into it, so the kernel itself pays zero extra arithmetic beyond the
4-multiply complex product per point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu import params as P
from smfft_tpu.ops import pallas_c2c as _pc

LANES = _pc.LANES


def freq_to_revblock(h: jnp.ndarray, n: int) -> jnp.ndarray:
    """Natural-order frequency row (n,) -> the kernel-internal revblock
    row (n_row,): rev[k2*128 + k1] = h[k1*c + k2] (kernel A's output
    layout, see emit_fft).  For n < 128 a row packs 128/n transforms, so
    the (natural-ordered) filter tiles across the packed blocks."""
    h = jnp.asarray(h)
    if n < LANES:
        return jnp.tile(h, LANES // n)
    c = n // LANES
    k1 = np.arange(LANES)
    idx = np.empty(n, np.int32)
    for k2 in range(c):
        idx[k2 * LANES + k1] = k1 * c + k2
    return h[idx]


def _default_conv_tile(n: int) -> int:
    # the fused kernel holds ~2x the live intermediates of a single-
    # direction kernel (forward result + inverse working set), so halve
    # the tuned single-kernel tile as the starting point
    return max(8, _pc.default_tile(n, False) // 2)


@functools.lru_cache(maxsize=None)
def _build_conv(n: int, precision: str, tile_t: int):
    """Fused convolution kernel specialized on (n, precision, tile)."""
    from smfft_tpu.config import debug_print
    debug_print(f"build conv kernel: n={n} precision={precision} "
                f"tile={tile_t}")
    fwd = _pc.const_arrays(n, inverse=False, precision=precision)
    inv = _pc.const_arrays(n, inverse=True, precision=precision)
    nc = _pc.n_consts(n, precision)
    n_row = max(n, LANES)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cf = _pc.read_consts(refs[2:2 + nc])
        ci = _pc.read_consts(refs[2 + nc:2 + 2 * nc])
        hr = refs[2 + 2 * nc][:]
        hi = refs[3 + 2 * nc][:]
        or_ref, oi_ref = refs[4 + 2 * nc], refs[5 + 2 * nc]
        # forward core: natural tile -> revblock spectrum (VMEM only)
        fr, fi = _pc.emit_fft(xr_ref[:], xi_ref[:], cf, n=n,
                              precision=precision)
        # spectral multiply against the (1, n_row) revblock filter row
        # (1/N already folded in); broadcast over the batch tile
        gr = fr * hr - fi * hi
        gi = fr * hi + fi * hr
        # inverse core: revblock spectrum -> natural output, no relayout
        br, bi = _pc.emit_fft_rev(gr, gi, ci, n=n, inverse=True,
                                  precision=precision)
        or_ref[:] = br
        oi_ref[:] = bi

    @jax.jit
    def run(vr, vi, hr, hi):
        b = vr.shape[0]
        grid = b // tile_t
        spec = pl.BlockSpec((tile_t, n_row), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((1, n_row), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        if _pc._INTERPRET:
            compiler_params = None
        else:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=([spec, spec] + [cspec] * (2 * nc) + [hspec, hspec]),
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b, n_row), jnp.float32),) * 2,
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *fwd, *inv, hr, hi)

    return run


def convolve_planar(vr: jnp.ndarray, vi: jnp.ndarray,
                    hr: jnp.ndarray, hi: jnp.ndarray, n: int,
                    precision: str = "highest",
                    tile_t: int | None = None):
    """Planar fused circular convolution.

    vr, vi: fp32 (B_rows, n_row) signal batch (row packing as
    fft_planar).  hr, hi: fp32 (n,) filter frequency response in natural
    order.  Returns planar (B_rows, n_row) = ifft(fft(x) * H) with numpy
    normalization (the 1/N is folded into the filter constants)."""
    if n not in P.SUPPORTED_C2C_SIZES:
        raise ValueError(f"Error wrong FFT length! N={n}; supported: "
                         f"{P.SUPPORTED_C2C_SIZES}")
    precision = _pc.resolve_scheme(precision, n)
    scale = np.float32(1.0 / n)
    hr = freq_to_revblock(jnp.asarray(hr, jnp.float32) * scale, n)[None, :]
    hi = freq_to_revblock(jnp.asarray(hi, jnp.float32) * scale, n)[None, :]
    vr, vi, rows = _pc._pad_rows(vr, vi)
    tile = _pc._pick_tile(vr.shape[0], n, tile_t or _default_conv_tile(n))
    run = _build_conv(n, precision, tile)
    o_r, o_i = run(vr, vi, hr, hi)
    if rows != o_r.shape[0]:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i


@functools.lru_cache(maxsize=None)
def _build_conv_bank(n: int, m: int, precision: str, tile_t: int):
    """Fused filter-BANK convolution kernel: one forward FFT per signal
    tile, then m spectral multiplies + m inverse FFTs, all in VMEM.

    This is the matched-filtering shape (convolve every signal against a
    bank of m templates) that motivates shared-memory-resident FFTs in
    the reference's home pipeline: m separate convolutions would read
    the signal and recompute its forward FFT m times; the bank kernel
    pays the input read and the forward core ONCE, so HBM traffic is
    in + m*out instead of m*(in + out) and the forward MXU work is
    amortized m-fold."""
    from smfft_tpu.config import debug_print
    debug_print(f"build conv bank kernel: n={n} m={m} "
                f"precision={precision} tile={tile_t}")
    fwd = _pc.const_arrays(n, inverse=False, precision=precision)
    inv = _pc.const_arrays(n, inverse=True, precision=precision)
    nc = _pc.n_consts(n, precision)
    n_row = max(n, LANES)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cf = _pc.read_consts(refs[2:2 + nc])
        ci = _pc.read_consts(refs[2 + nc:2 + 2 * nc])
        hr_ref = refs[2 + 2 * nc]
        hi_ref = refs[3 + 2 * nc]
        or_ref, oi_ref = refs[4 + 2 * nc], refs[5 + 2 * nc]
        fr, fi = _pc.emit_fft(xr_ref[:], xi_ref[:], cf, n=n,
                              precision=precision)
        for j in range(m):
            hr = hr_ref[j:j + 1, :]
            hi = hi_ref[j:j + 1, :]
            gr = fr * hr - fi * hi
            gi = fr * hi + fi * hr
            br, bi = _pc.emit_fft_rev(gr, gi, ci, n=n, inverse=True,
                                      precision=precision)
            or_ref[j] = br
            oi_ref[j] = bi

    @jax.jit
    def run(vr, vi, hr, hi):
        b = vr.shape[0]
        grid = b // tile_t
        spec = pl.BlockSpec((tile_t, n_row), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((m, n_row), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((m, tile_t, n_row), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        if _pc._INTERPRET:
            compiler_params = None
        else:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=([spec, spec] + [cspec] * (2 * nc) + [hspec, hspec]),
            out_specs=(ospec, ospec),
            out_shape=(jax.ShapeDtypeStruct((m, b, n_row),
                                            jnp.float32),) * 2,
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *fwd, *inv, hr, hi)

    return run


def convolve_bank_planar(vr: jnp.ndarray, vi: jnp.ndarray,
                         hr: jnp.ndarray, hi: jnp.ndarray, n: int,
                         precision: str = "highest",
                         tile_t: int | None = None):
    """Planar fused bank convolution: signal (B_rows, n_row) against m
    natural-order filter responses hr/hi (m, n) -> (m, B_rows, n_row)."""
    if n not in P.SUPPORTED_C2C_SIZES:
        raise ValueError(f"Error wrong FFT length! N={n}; supported: "
                         f"{P.SUPPORTED_C2C_SIZES}")
    precision = _pc.resolve_scheme(precision, n)
    m = hr.shape[0]
    scale = np.float32(1.0 / n)
    hr = jnp.stack([freq_to_revblock(jnp.asarray(hr[j], jnp.float32)
                                     * scale, n) for j in range(m)])
    hi = jnp.stack([freq_to_revblock(jnp.asarray(hi[j], jnp.float32)
                                     * scale, n) for j in range(m)])
    vr, vi, rows = _pc._pad_rows(vr, vi)
    if tile_t is None:
        # the m output frames live in VMEM per grid step — shrink the
        # batch tile with the bank size (power of two so the halving
        # loop in _pick_tile can still land on a divisor)
        tile_t = max(8, _pc.default_tile(n, False) // (2 * max(1, m)))
        tile_t = 1 << (tile_t.bit_length() - 1)
    tile = _pc._pick_tile(vr.shape[0], n, tile_t)
    run = _build_conv_bank(n, m, precision, tile)
    o_r, o_i = run(vr, vi, hr, hi)
    if rows != o_r.shape[1]:
        o_r, o_i = o_r[:, :rows], o_i[:, :rows]
    return o_r, o_i


@functools.lru_cache(maxsize=None)
def _build_conv_real(n: int, precision: str, tile_t: int):
    """Fused REAL convolution kernel: r2c -> half-spectrum multiply ->
    c2r, one VMEM pass — half the HBM traffic and roughly half the
    arithmetic of the complex kernel (real in, real out, half-size
    spectrum).  The real-transform emitters pair with zero relayout:
    emit_rfft's revblock packed spectrum is exactly what emit_irfft
    consumes."""
    from smfft_tpu.config import debug_print
    from smfft_tpu.ops import pallas_real as PR
    debug_print(f"build conv real kernel: n={n} precision={precision} "
                f"tile={tile_t}")
    fwd = PR._rfft_tables(n, precision)
    inv = PR._irfft_tables(n, precision)
    ncf, nci = len(fwd), len(inv)
    L = n // 2

    def kernel(*refs):
        x_ref = refs[0]
        cf = tuple(r[:] for r in refs[1:1 + ncf])
        ci = tuple(r[:] for r in refs[1 + ncf:1 + ncf + nci])
        hr = refs[1 + ncf + nci][:]
        hi = refs[2 + ncf + nci][:]
        o_ref = refs[3 + ncf + nci]
        fr, fi = PR.emit_rfft(x_ref[:], cf, n=n, tile_t=tile_t,
                              precision=precision)
        # packed half-spectrum product: complex everywhere except slot 0
        # (column 0 packs (DC, Nyquist) — both real for real signals and
        # real filters, so the product there is two independent real
        # multiplies)
        at0 = jax.lax.broadcasted_iota(jnp.int32, fr.shape, 1) == 0
        gr = jnp.where(at0, fr * hr, fr * hr - fi * hi)
        gi = jnp.where(at0, fi * hi, fr * hi + fi * hr)
        o_ref[:] = PR.emit_irfft(gr, gi, ci, n=n, tile_t=tile_t,
                                 precision=precision)

    @jax.jit
    def run(x, hr, hi):
        b = x.shape[0]
        grid = b // tile_t
        in_spec = pl.BlockSpec((tile_t, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = in_spec
        cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((1, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        if _pc._INTERPRET:
            compiler_params = None
        else:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=([in_spec] + [cspec] * (ncf + nci) + [hspec, hspec]),
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(x, *fwd, *inv, hr, hi)

    return run


def _pack_real_response(hr, hi, n: int):
    """rfft-style half response (n/2+1 real/imag rows) -> the packed
    revblock (1, n/2) filter rows with the inverse's 1/(n/2) folded in.
    Slot 0 packs (Re H[0], Re H[n/2]); the DC/Nyquist imaginary parts
    are ignored (zero for any real filter)."""
    L = n // 2
    scale = np.float32(1.0 / L)
    hr = jnp.asarray(hr, jnp.float32) * scale
    hi = jnp.asarray(hi, jnp.float32) * scale
    pk_r = jnp.concatenate([hr[:1], hr[1:L]])
    pk_i = jnp.concatenate([hr[L:L + 1], hi[1:L]])
    return (freq_to_revblock(pk_r, L)[None, :],
            freq_to_revblock(pk_i, L)[None, :])


def convolve_real_planar(x: jnp.ndarray, hr: jnp.ndarray,
                         hi: jnp.ndarray, n: int,
                         precision: str = "highest",
                         tile_t: int | None = None):
    """Fused real circular convolution: real rows (B, n) fp32 against an
    rfft-style frequency response hr/hi (n/2+1,) -> real (B, n)."""
    if n < 256 or n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(
            f"Error wrong FFT length! real convolve supports n in "
            f"{[s for s in P.SUPPORTED_REAL_SIZES if s >= 256]}, got {n}")
    precision = _pc.resolve_scheme_real(precision, n)
    hr, hi = _pack_real_response(hr, hi, n)
    zeros = jnp.zeros_like(x)
    x, _, rows = _pc._pad_rows(x, zeros)
    tile = _pc._pick_tile(x.shape[0], n, tile_t or _default_conv_tile(n))
    run = _build_conv_real(n, precision, tile)
    out = run(x, hr, hi)
    return out[:rows] if rows != out.shape[0] else out


@functools.lru_cache(maxsize=None)
def _build_conv_real_bank(n: int, m: int, precision: str, tile_t: int):
    """Real filter-bank kernel: one r2c per signal tile, m half-spectrum
    multiplies + m c2r inverses in VMEM (see _build_conv_bank — this is
    the real-signal matched-filtering form at half the traffic)."""
    from smfft_tpu.config import debug_print
    from smfft_tpu.ops import pallas_real as PR
    debug_print(f"build conv real bank kernel: n={n} m={m} "
                f"precision={precision} tile={tile_t}")
    fwd = PR._rfft_tables(n, precision)
    inv = PR._irfft_tables(n, precision)
    ncf, nci = len(fwd), len(inv)
    L = n // 2

    def kernel(*refs):
        x_ref = refs[0]
        cf = tuple(r[:] for r in refs[1:1 + ncf])
        ci = tuple(r[:] for r in refs[1 + ncf:1 + ncf + nci])
        hr_ref = refs[1 + ncf + nci]
        hi_ref = refs[2 + ncf + nci]
        o_ref = refs[3 + ncf + nci]
        fr, fi = PR.emit_rfft(x_ref[:], cf, n=n, tile_t=tile_t,
                              precision=precision)
        at0 = jax.lax.broadcasted_iota(jnp.int32, fr.shape, 1) == 0
        for j in range(m):
            hr = hr_ref[j:j + 1, :]
            hi = hi_ref[j:j + 1, :]
            gr = jnp.where(at0, fr * hr, fr * hr - fi * hi)
            gi = jnp.where(at0, fi * hi, fr * hi + fi * hr)
            o_ref[j] = PR.emit_irfft(gr, gi, ci, n=n, tile_t=tile_t,
                                     precision=precision)

    @jax.jit
    def run(x, hr, hi):
        b = x.shape[0]
        grid = b // tile_t
        in_spec = pl.BlockSpec((tile_t, n), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        hspec = pl.BlockSpec((m, L), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        ospec = pl.BlockSpec((m, tile_t, n), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM)
        if _pc._INTERPRET:
            compiler_params = None
        else:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=([in_spec] + [cspec] * (ncf + nci) + [hspec, hspec]),
            out_specs=ospec,
            out_shape=jax.ShapeDtypeStruct((m, b, n), jnp.float32),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(x, *fwd, *inv, hr, hi)

    return run


def convolve_real_bank_planar(x: jnp.ndarray, hr: jnp.ndarray,
                              hi: jnp.ndarray, n: int,
                              precision: str = "highest",
                              tile_t: int | None = None):
    """Planar real bank convolution: real rows (B, n) against m
    rfft-style responses hr/hi (m, n/2+1) -> (m, B, n) real."""
    if n < 256 or n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(
            f"Error wrong FFT length! real convolve supports n in "
            f"{[s for s in P.SUPPORTED_REAL_SIZES if s >= 256]}, got {n}")
    precision = _pc.resolve_scheme_real(precision, n)
    m = hr.shape[0]
    packed = [_pack_real_response(hr[j], hi[j], n) for j in range(m)]
    hr = jnp.concatenate([p[0] for p in packed], axis=0)
    hi = jnp.concatenate([p[1] for p in packed], axis=0)
    zeros = jnp.zeros_like(x)
    x, _, rows = _pc._pad_rows(x, zeros)
    if tile_t is None:
        tile_t = max(8, _pc.default_tile(n, False) // (2 * max(1, m)))
        tile_t = 1 << (tile_t.bit_length() - 1)
    tile = _pc._pick_tile(x.shape[0], n, tile_t)
    run = _build_conv_real_bank(n, m, precision, tile)
    out = run(x, hr, hi)
    return out[:, :rows] if rows != out.shape[1] else out


def convolve_real_bank_pallas(x: jnp.ndarray, h: jnp.ndarray,
                              precision: str = "highest",
                              tile_t: int | None = None) -> jnp.ndarray:
    """Real bank wrapper: x fp32 (..., N), h complex64 (M, N/2+1)
    rfft-style responses -> (M, ..., N) real convolutions."""
    n = x.shape[-1]
    m = h.shape[0]
    batch_shape = x.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    out = convolve_real_bank_planar(x.reshape(b, n), jnp.real(h),
                                    jnp.imag(h), n, precision=precision,
                                    tile_t=tile_t)
    return out.reshape((m,) + batch_shape + (n,))


def convolve_real_pallas(x: jnp.ndarray, h: jnp.ndarray,
                         precision: str = "highest",
                         tile_t: int | None = None) -> jnp.ndarray:
    """Real convenience wrapper: x fp32 (..., N), h complex64 (N/2+1,)
    rfft-style response -> real circular convolution (..., N)."""
    n = x.shape[-1]
    batch_shape = x.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    out = convolve_real_planar(x.reshape(b, n), jnp.real(h), jnp.imag(h),
                               n, precision=precision, tile_t=tile_t)
    return out.reshape(batch_shape + (n,))


def convolve_pallas(x: jnp.ndarray, h: jnp.ndarray,
                    precision: str = "highest",
                    tile_t: int | None = None) -> jnp.ndarray:
    """Complex convenience wrapper: x complex64 (..., N), h complex64 (N,)
    natural-order frequency response -> circular convolution (..., N)."""
    n = x.shape[-1]
    vr, vi, batch_shape = _pc._to_rows(x, n)
    o_r, o_i = convolve_planar(vr, vi, jnp.real(h), jnp.imag(h), n,
                               precision=precision, tile_t=tile_t)
    out = jax.lax.complex(o_r, o_i)
    return out.reshape(batch_shape + (n,))


def convolve_bank_pallas(x: jnp.ndarray, h: jnp.ndarray,
                         precision: str = "highest",
                         tile_t: int | None = None) -> jnp.ndarray:
    """Complex bank wrapper: x complex64 (..., N), h complex64 (M, N)
    natural-order responses -> (M, ..., N) convolutions."""
    n = x.shape[-1]
    m = h.shape[0]
    vr, vi, batch_shape = _pc._to_rows(x, n)
    o_r, o_i = convolve_bank_planar(vr, vi, jnp.real(h), jnp.imag(h), n,
                                    precision=precision, tile_t=tile_t)
    out = jax.lax.complex(o_r, o_i)
    return out.reshape((m,) + batch_shape + (n,))
