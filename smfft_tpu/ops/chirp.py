"""Fused Bluestein (chirp-z) kernel: arbitrary-length DFT in ONE pass.

The composed form (pad -> convolve -> slice, smfft_tpu/bluestein.py)
pays ~5x the useful HBM traffic: the zero-padded m-length signal and
the m-length convolution output both round-trip HBM, and the chirp
multiplies ride separate XLA passes.  This kernel keeps everything
except the caller's n-length rows in VMEM:

    load (tile, n_pad) -> pre-chirp multiply -> zero-extend to m
    -> forward core (emit_fft, revblock spectrum)
    -> chirp-filter multiply (1/m folded)
    -> inverse core (emit_fft_rev, natural)
    -> post-chirp multiply on the first n_pad lanes -> store

HBM traffic is n_pad complex in + out per row (n_pad = n rounded up to
the 128-lane granule) — the padded convolution length m >= 2n-1 exists
only in VMEM.  Useful-bytes throughput lands at ~0.4x the c2c roofline
at m = 2x (the kernel streams n_pad but computes an m-point FFT pair),
vs ~0.07x for the composed path.

Same emit_fft/emit_fft_rev composition as ops/convolve.py — the
``__device__``-style composability the reference advertises its cores
for (reference README.md:10,30-33), driven one level further: the
surrounding algorithm (Bluestein 1968) is itself fused into the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops import pallas_c2c as _pc

LANES = _pc.LANES


def _n_pad(n: int) -> int:
    return max(LANES, -(-n // LANES) * LANES)


@functools.lru_cache(maxsize=None)
def _chirp_consts(n: int, m: int):
    """Planar fp32 chirp constants: pre-chirp (1, n_pad) pair, revblock
    filter-with-1/m (1, m) pair, post-chirp (1, n_pad) pair (zeroed
    beyond n so the padded output lanes come out exactly zero).
    Exact integer reduction of j^2 mod 2n keeps the fp64 phase exact."""
    np_ = _n_pad(n)
    j = np.arange(n, dtype=np.int64)
    w = np.exp(-1j * np.pi * ((j * j) % (2 * n)) / n)
    b = np.zeros(m, np.complex128)
    b[:n] = np.conj(w)
    b[m - n + 1:] = np.conj(w[1:][::-1])
    h = np.fft.fft(b) / m                   # 1/m folded into the filter
    pre = np.zeros((1, np_), np.complex64)
    pre[0, :n] = w.astype(np.complex64)
    post = pre.copy()                       # identical chirp both sides
    # revblock reindex in pure numpy (freq_to_revblock's jnp path would
    # trace under jit; this runs at build time on the host)
    c = m // LANES
    k1 = np.arange(LANES)
    idx = np.empty(m, np.int64)
    for k2 in range(c):
        idx[k2 * LANES + k1] = k1 * c + k2
    hrev = h[idx]
    f32 = lambda a: np.ascontiguousarray(np.real(a), np.float32)
    return (f32(pre), np.ascontiguousarray(np.imag(pre), np.float32),
            np.real(hrev)[None, :].astype(np.float32),
            np.imag(hrev)[None, :].astype(np.float32),
            f32(post), np.ascontiguousarray(np.imag(post), np.float32))


@functools.lru_cache(maxsize=None)
def _build_bluestein(n: int, m: int, precision: str, tile_t: int,
                     interpret: bool = False):
    """Fused Bluestein kernel specialized on (n, m, precision, tile);
    ``interpret`` keys the cache so test-mode builds never shadow
    compiled ones."""
    from smfft_tpu.config import debug_print
    debug_print(f"build bluestein kernel: n={n} m={m} "
                f"precision={precision} tile={tile_t}")
    np_ = _n_pad(n)
    fwd = _pc.const_arrays(m, inverse=False, precision=precision)
    inv = _pc.const_arrays(m, inverse=True, precision=precision)
    nc = _pc.n_consts(m, precision)
    chirps = _chirp_consts(n, m)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cf = _pc.read_consts(refs[2:2 + nc])
        ci = _pc.read_consts(refs[2 + nc:2 + 2 * nc])
        pre_r, pre_i, hr, hi, post_r, post_i = (
            r[:] for r in refs[2 + 2 * nc:8 + 2 * nc])
        or_ref, oi_ref = refs[8 + 2 * nc], refs[9 + 2 * nc]

        xr, xi = xr_ref[:], xi_ref[:]       # (tile, n_pad) natural rows
        ar = xr * pre_r - xi * pre_i        # pre-chirp (zero beyond n)
        ai = xr * pre_i + xi * pre_r
        zpad = jnp.zeros((tile_t, m - np_), jnp.float32)
        ar = jnp.concatenate([ar, zpad], axis=1)   # VMEM-only extend
        ai = jnp.concatenate([ai, zpad], axis=1)
        fr, fi = _pc.emit_fft(ar, ai, cf, n=m, precision=precision)
        gr = fr * hr - fi * hi              # chirp filter (1/m folded)
        gi = fr * hi + fi * hr
        br, bi = _pc.emit_fft_rev(gr, gi, ci, n=m, inverse=True,
                                  precision=precision)
        cr, cim = br[:, :np_], bi[:, :np_]  # lanes >= n are don't-care
        or_ref[:] = cr * post_r - cim * post_i   # post-chirp zeros them
        oi_ref[:] = cr * post_i + cim * post_r

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        spec = pl.BlockSpec((tile_t, np_), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        cspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        npspec = pl.BlockSpec((1, np_), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
        mspec = pl.BlockSpec((1, m), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
        if interpret:
            compiler_params = None
        else:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(b // tile_t,),
            in_specs=([spec, spec] + [cspec] * (2 * nc)
                      + [npspec, npspec, mspec, mspec, npspec, npspec]),
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b, np_), jnp.float32),) * 2,
            compiler_params=compiler_params,
            interpret=interpret,
        )(vr, vi, *fwd, *inv, *(jnp.asarray(c) for c in chirps))

    return run


def bluestein_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int, m: int,
                     precision: str = "highest",
                     tile_t: int | None = None):
    """Arbitrary-length DFT, fused: planar (B, n_pad) rows whose first n
    lanes hold the signal (rest zero) -> planar (B, n_pad) spectra
    (lanes >= n exactly zero).  m is the supported power-of-two
    convolution length >= 2n-1."""
    np_ = _n_pad(n)
    if vr.shape[-1] != np_:
        raise ValueError(f"expected padded row width {np_}, got "
                         f"{vr.shape[-1]}")
    precision = _pc.resolve_scheme(precision, m)
    rows = vr.shape[0]
    # the intermediates live at width m, so tune the tile for m (the
    # device sweep is flat 64..512 at m=2048: 191-194 GB/s useful)
    tile = tile_t or max(8, _pc.default_tile(m, False))
    pad = (-rows) % tile
    while pad >= rows and tile > 8:
        tile //= 2
        pad = (-rows) % tile
    if pad:
        zeros = jnp.zeros((pad, np_), jnp.float32)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    run = _build_bluestein(n, m, precision, tile, _pc._INTERPRET)
    o_r, o_i = run(vr.astype(jnp.float32), vi.astype(jnp.float32))
    return (o_r[:rows], o_i[:rows]) if pad else (o_r, o_i)
