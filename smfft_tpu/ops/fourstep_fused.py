"""Fused two-pass four-step FFT: huge-N transforms at streaming speed.

The round-3 four-step (ops/fourstep.py) glued the roofline row kernels
with complex64 XLA ops — swapaxes transposes and an XLA twiddle between
kernel calls — and every complex64 op on this chip moves at ~170-230
GB/s (smfft_tpu/planar.py), so `fft_large` at 2**20 ran at 21.6 GB/s
effective, 2.5x SLOWER than stock jnp.fft (BENCH_r03).  This module is
the TPU-native rebuild: the whole transform is TWO fused Pallas passes,
each one HBM read + one HBM write of planar fp32 data, with every
transpose done on the in-VMEM tile and the inter-factor twiddle fused
into pass 1's epilogue as two small table reads (no gathers, no complex
dtype anywhere).

    x viewed as A[b, t1, t2]   (n = n1*n2, both supported row sizes)
    pass 1 (grid b x n2/T2):
       read strided block A[b, :, jT2:(j+1)T2]           (n1, T2)
       VMEM transpose -> (T2, n1) rows
       emit_fft ordered over n1                          -> B[t2, k1]
       twiddle B *= W_n^{t2*k1}   (exact split, see below)
       write contiguous block of Bmat[b] (n2, n1)
    pass 2 (grid b x n1/T1):
       read strided block Bmat[b][:, jT1:(j+1)T1]        (n2, T1)
       VMEM transpose -> (T1, n2) rows
       emit_fft ordered over n2                          -> C[k1, k2]
       VMEM transpose -> (n2, T1)
       write strided block of X[b] (n2, n1); X[k2*n1+k1] = C[k1,k2]

Total HBM traffic: 2 reads + 2 writes of the data (32 B/point planar
fp32) + ~1 B/point of twiddle tables — against the single-pass row
kernels' 16 B/point.  At the device-measured 656 GB/s stream roofline
the in+out "effective" ceiling is therefore ~656/2 = 328 GB/s; stock
jnp.fft measures 52.9 GB/s on the same chip (BENCH_r03).

Twiddle exactness (same discipline as ops/fourstep.py): the exponent
e = t2*k1 is split by the lane digit k1 = a*128 + b EXACTLY:
W_n^(t2*k1) = F1[t2, a] * F2[t2, b] with F1[t2, a] = W_n^(t2*a*128 mod n)
and F2[t2, b] = W_n^(t2*b mod n), both fp64-computed fp32-rounded host
tables of shape (n2, 128) — block-indexed by the grid like the data, so
the kernel pays two broadcast complex multiplies and zero index math.

Reference anchor: this removes the reference's N <= 4096 shared-memory
cap (SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:656-658 "Error wrong FFT
length!") the TPU way; the decomposition itself is the classic
four-step the reference's radix ladder would need at block scale.
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
from smfft_tpu.ops.fourstep import split_factors

LANES = 128


def _twiddle_split_tables(n: int, n1: int, n2: int, inverse: bool,
                          scale: float = 1.0):
    """(f1_r, f1_i, f2_r, f2_i) fp32 (n2, 128) tables with
    W_n^(t2*k1) * scale == F1[t2, k1 // 128] * F2[t2, k1 % 128].

    The lane-digit split of the exponent is exact integer arithmetic;
    each factor is fp64-computed then fp32-rounded, so the fused product
    carries ~1.5 ulp — the same error class as ops/fourstep.py's hi/lo
    modular tables.  ``scale`` (a power of two: 1/n for backward-norm
    inverses) is folded into F1 exactly."""
    sign = 2j * np.pi / n if inverse else -2j * np.pi / n
    t2 = np.arange(n2, dtype=np.int64)[:, None]
    a = np.arange(LANES, dtype=np.int64)[None, :]
    f1 = np.exp(sign * ((t2 * a * LANES) % n)) * scale
    f2 = np.exp(sign * ((t2 * a) % n))
    return (f1.real.astype(np.float32), f1.imag.astype(np.float32),
            f2.real.astype(np.float32), f2.imag.astype(np.float32))


def _apply_twiddle(zr, zi, f1r, f1i, f2r, f2i, c1: int):
    """Multiply the (T2, n1) pass-1 FFT output rows by the four-step
    twiddle: chunk a gets (F1[:, a] broadcast) * F2 — two broadcast
    complex multiplies per chunk, no gathers, no iotas."""
    out_r, out_i = [], []
    for a in range(c1):
        cr = zr[:, a * LANES:(a + 1) * LANES]
        ci = zi[:, a * LANES:(a + 1) * LANES]
        ar, ai = f1r[:, a:a + 1], f1i[:, a:a + 1]
        # g = F1[:, a] * F2   (broadcast (T2,1) x (T2,128))
        gr = ar * f2r - ai * f2i
        gi = ar * f2i + ai * f2r
        out_r.append(cr * gr - ci * gi)
        out_i.append(cr * gi + ci * gr)
    return (jnp.concatenate(out_r, axis=-1) if c1 > 1 else out_r[0],
            jnp.concatenate(out_i, axis=-1) if c1 > 1 else out_i[0])


def _pass_tile(nf: int, other: int) -> int:
    """Lane-tile width for the strided block over the non-transform
    factor: at least 128 (one lane tile / 512 B contiguous per HBM
    row), at most the whole factor, sized so a (nf, tile) fp32 plane
    stays within ~4 MB for pipelining headroom."""
    t = max(LANES, min(other, (4 << 20) // (4 * nf)))
    while other % t:
        t //= 2
    return max(LANES, t)


@functools.lru_cache(maxsize=None)
def _build_pass1(n: int, n1: int, n2: int, t2: int, inverse: bool,
                 precision: str):
    """Pass 1: strided read + transpose + row FFT over n1 + fused
    four-step twiddle + contiguous write.  Grid (B, n2 // t2)."""
    from smfft_tpu.config import debug_print
    debug_print(f"build fourstep pass1: n={n} {n1}x{n2} t2={t2} "
                f"inverse={inverse} precision={precision}")
    prec = _pc.resolve_scheme(precision, n1)
    nc = _pc.n_consts(n1, prec)
    c1 = n1 // LANES
    jblocks = n2 // t2

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts = _pc.read_consts(refs[2:2 + nc])
        f1r, f1i, f2r, f2i = (r[:] for r in refs[2 + nc:2 + nc + 4])
        o_r, o_i = refs[2 + nc + 4:]
        ar = jnp.transpose(x_r[:])        # (n1, T2) -> (T2, n1)
        ai = jnp.transpose(x_i[:])
        zr, zi = _pc.emit_fft(ar, ai, consts, n=n1, inverse=inverse,
                              precision=prec, ordered=True)
        o_r[:], o_i[:] = _apply_twiddle(zr, zi, f1r, f1i, f2r, f2i, c1)

    in_spec = pl.BlockSpec((n1, t2), lambda b, j: (b, j),
                           memory_space=pltpu.VMEM)
    tw_spec = pl.BlockSpec((t2, LANES), lambda b, j: (j, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((t2, n1), lambda b, j: (b * jblocks + j, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * nc
    consts = _pc.const_arrays(n1, inverse, prec)

    @jax.jit
    def run(vr, vi, f1r, f1i, f2r, f2i):
        b = vr.shape[0] // n1
        cost = pl.CostEstimate(
            flops=int(6 * n * np.log2(n1) * b),
            bytes_accessed=b * n * 4 * 4, transcendentals=0)
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel"))
        return pl.pallas_call(
            kernel, grid=(b, jblocks),
            in_specs=[in_spec, in_spec] + const_specs + [tw_spec] * 4,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b * n2, n1), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *consts, f1r, f1i, f2r, f2i)
    return run


@functools.lru_cache(maxsize=None)
def _build_pass2(n: int, n1: int, n2: int, t1: int, inverse: bool,
                 precision: str):
    """Pass 2: strided read + transpose + row FFT over n2 + transpose +
    strided write.  Grid (B, n1 // t1)."""
    from smfft_tpu.config import debug_print
    debug_print(f"build fourstep pass2: n={n} {n1}x{n2} t1={t1} "
                f"inverse={inverse} precision={precision}")
    prec = _pc.resolve_scheme(precision, n2)
    nc = _pc.n_consts(n2, prec)

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts = _pc.read_consts(refs[2:2 + nc])
        o_r, o_i = refs[2 + nc:]
        ar = jnp.transpose(x_r[:])        # (n2, T1) -> (T1, n2)
        ai = jnp.transpose(x_i[:])
        zr, zi = _pc.emit_fft(ar, ai, consts, n=n2, inverse=inverse,
                              precision=prec, ordered=True)
        o_r[:] = jnp.transpose(zr)        # (T1, n2) -> (n2, T1)
        o_i[:] = jnp.transpose(zi)

    spec = pl.BlockSpec((n2, t1), lambda b, j: (b, j),
                        memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * nc
    consts = _pc.const_arrays(n2, inverse, prec)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0] // n2
        cost = pl.CostEstimate(
            flops=int(6 * n * np.log2(n2) * b),
            bytes_accessed=b * n * 4 * 4, transcendentals=0)
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel", "parallel"))
        return pl.pallas_call(
            kernel, grid=(b, n1 // t1),
            in_specs=[spec, spec] + const_specs, out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b * n2, n1), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *consts)
    return run


def dispatch_planar(vr: jnp.ndarray, vi: jnp.ndarray, *,
                    inverse: bool = False, precision: str | None = None,
                    scale: float = 1.0):
    """Planar huge-N C2C dispatch — the fused TPU path behind
    planar.fft_large / api.fft_large.  Row sizes (N <= 16384) go to the
    single-pass row kernels; N = 2**15..2**17 to the single-HBM-pass
    rowfour kernel; N = 2**18..2**24 to the retile-free multi-pass
    pipeline (ops/hugefft.py); beyond that to the strided two-pass."""
    from smfft_tpu import api
    from smfft_tpu.ops import hugefft, rowfour
    n = vr.shape[-1]
    precision = api._resolve_precision(precision)
    if n in P.SUPPORTED_C2C_SIZES:
        r = vr.reshape(-1, n)
        i = vi.reshape(-1, n)
        o_r, o_i = _pc.fft_planar(r, i, n, inverse=inverse, ordered=True,
                                  precision=precision,
                                  scale=scale if scale != 1.0 else None)
        return (o_r.reshape(vr.shape), o_i.reshape(vi.shape))
    if n in rowfour.FACTORS:
        return rowfour.fft_rowfour_planar(vr, vi, inverse=inverse,
                                          precision=precision, scale=scale)
    if n <= hugefft.FIVE_PASS_MAX:
        # covers 2**18..2**28: three-pass to 2**24, five-pass beyond
        # (device-verified at 2**25; the old strided two-pass
        # fft_large_planar remains only as an explicit fallback)
        return hugefft.fft_huge_planar(vr, vi, inverse=inverse,
                                       precision=precision, scale=scale)
    return fft_large_planar(vr, vi, inverse=inverse, precision=precision,
                            scale=scale)


def fft_large_planar(vr: jnp.ndarray, vi: jnp.ndarray, *,
                     inverse: bool = False, precision: str = "highest",
                     scale: float = 1.0,
                     factors: tuple[int, int] | None = None):
    """Fused four-step C2C FFT over the last axis for huge power-of-two
    N (2**15..2**28), planar fp32 in/out, natural order, unnormalized
    (``scale`` — a power of two, e.g. 1/n — is folded exactly into the
    pass-1 twiddle tables).  Batched over leading axes."""
    n = vr.shape[-1]
    if vr.shape != vi.shape:
        raise ValueError(f"planar pair shapes differ: {vr.shape} vs "
                         f"{vi.shape}")
    n1, n2 = factors if factors is not None else split_factors(n, 128)
    if n1 * n2 != n:
        raise ValueError(f"factors {n1}*{n2} != N={n}")
    batch = vr.shape[:-1]
    vr = jnp.asarray(vr, jnp.float32).reshape(-1, n1, n2).reshape(-1, n2)
    vi = jnp.asarray(vi, jnp.float32).reshape(-1, n1, n2).reshape(-1, n2)
    t2 = _pass_tile(n1, n2)
    t1 = _pass_tile(n2, n1)
    f1r, f1i, f2r, f2i = (jnp.asarray(t) for t in _twiddle_split_tables(
        n, n1, n2, inverse, scale))
    br, bi = _build_pass1(n, n1, n2, t2, inverse, precision)(
        vr, vi, f1r, f1i, f2r, f2i)
    o_r, o_i = _build_pass2(n, n1, n2, t1, inverse, precision)(br, bi)
    return o_r.reshape(batch + (n,)), o_i.reshape(batch + (n,))
