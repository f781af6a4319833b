"""Retile-free huge-N FFT: fused multi-pass four-step at streaming speed.

The round-3 fused two-pass (ops/fourstep_fused.py) reads strided
``(n1, t2)`` column slabs, and a 512-byte-contiguous strided HBM read
moves at ~155 GB/s on this chip — the passes were retile-bound, not
compute-bound (fft_large 2**20 measured 21.6 -> 105 GB/s effective,
still losing to the 656 GB/s stream roofline by 6x).  This module is
the round-4 rebuild on a device-ablated rule: EVERY pass reads and
writes CONTIGUOUS blocks; all transposition is either a dedicated
in-VMEM transpose pass (P0, measured 663 GB/s — full roofline) or free
reshape folding in the block read/write.

Decompose N = M * 128 with t = t1*128 + t2 (t2 minor) and k = k2*M + k1:

    P0  transpose (B, N) -> Z0 (B*128, M):   Z0[b*128+t2, t1] = x[b, t]
        contiguous (8, T*128) reads, in-VMEM (8, T, 128) -> (8*128, T)
        transpose, contiguous (1024, T) writes.      [663 GB/s measured]

    two-pass finisher (N = 2**18..2**21, M = 2**11..2**14):
    P2d grid (B,): read Z0 block (128, M) = one whole transform in VMEM;
        emit_fft ordered over M (lane dim, rows already transposed);
        twiddle W_N^(t2*k1) from exact lane-digit split tables; packed
        sublane 128-DFT (ops/rowfour.stage2); the (128, M) result IS the
        natural output row — written as a contiguous (8, N/8) block of
        the (B*8, N/8) output, which is bit-identical to (B, N).
                                   [283 GB/s measured at 2**18 -> 198
                                    GB/s end-to-end effective]

    three-pass finisher (N = 2**22..2**24, M = 2**15..2**17 — one
    transform no longer fits VMEM):
    P1  grid (B*128/8,): rowfour single-pass ordered M-FFT per row
        (ops/rowfour.py, 241-269 GB/s) + the N-twiddle W_N^(t2*k1)
        fused into its epilogue, t2 = row % 128 selected by block index
        maps on the (128, M/128) split tables.
    P2c grid (B, M/CH): final 128-point DFT contracting the t2 rows —
        read (128, CH) tile of Z1, packed sublane DFT, write the same
        (128, CH) tile of the output viewed as (B*128, M) [k2-major] =
        (B, N) natural.                        [memory-bound: 2 packed
                                                bf16x3 dots per tile]

Twiddle exactness: W_N^(t2*k1) = F1[t2, k1 // 128] * F2[t2, k1 % 128],
fp64-computed fp32-rounded host tables (exact integer exponent split;
``scale`` folds into F1) — ops/fourstep_fused._twiddle_split_tables.

Reference anchor: removes the N <= 4096 shared-memory cap of
SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:656-658 ("Error wrong FFT
length!") at TPU scale; the decomposition is Bailey's four-step mapped
to MXU matmul factors instead of CUDA thread blocks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops import pallas_c2c as _pc
from smfft_tpu.ops import rowfour as RF
from smfft_tpu.ops.fourstep_fused import _twiddle_split_tables

LANES = 128

#: P1 row sizes at or above this use the in-VMEM rowfour body instead
#: of the plain fused row kernel.  The plain kernel at M = 16384 only
#: fits 64-row blocks next to the G tables (remote-compile OOM at 128)
#: and measures 240 GB/s inside P1 — the n=2**21 three-pass cliff
#: (VERDICT r4 weak #7); the rowfour body keeps 8-row blocks.
P1_ROWFOUR_MIN = 16384

#: two-pass window: one whole transform (128, M) planar fp32 + its
#: (8, N/8) output block must fit VMEM alongside the row-kernel consts.
TWO_PASS_MAX = 1 << 21

#: three-pass window: M = N/128 must be a row or rowfour size
#: (2**11..2**17).
THREE_PASS_MAX = 1 << 24

#: five-pass window: M2 = N/2**14 must be a plain row size
#: (2**11..2**14).
FIVE_PASS_MAX = 1 << 28

_VMEM_LIMIT = 110 * 1024 * 1024


def _p0_tile(n1: int) -> int:
    """Lane tile (in units of the minor n1 axis) for the transpose
    pass: (8, t*128) in-blocks sized to ~4 MB fp32 — with double
    buffering on 2 inputs + 2 outputs that is ~32 MB VMEM."""
    t = max(1, min(n1, (4 << 20) // (4 * 8 * LANES)))
    while n1 % t:
        t //= 2
    return t


@functools.lru_cache(maxsize=None)
def _build_p0(n: int, n1: int, t1: int):
    """Transpose pass (B, n) -> (B*128, n1): contiguous (8, t1*128)
    reads, in-VMEM transpose, contiguous (1024, t1) writes.  Measured
    663 GB/s (tools/probe_s8.py) — the full stream roofline."""
    def kernel(x_r, x_i, o_r, o_i):
        ar = x_r[:].reshape(8, t1, LANES)
        ai = x_i[:].reshape(8, t1, LANES)
        o_r[:] = jnp.transpose(ar, (0, 2, 1)).reshape(8 * LANES, t1)
        o_i[:] = jnp.transpose(ai, (0, 2, 1)).reshape(8 * LANES, t1)

    in_spec = pl.BlockSpec((8, t1 * LANES), lambda b, i: (b, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8 * LANES, t1), lambda b, i: (b, i),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run_p0(vr, vi):
        b = vr.shape[0]
        cost = pl.CostEstimate(flops=0, bytes_accessed=b * n * 4 * 4,
                               transcendentals=0)
        cp = None
        if not _pc._INTERPRET:
            cp = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                dimension_semantics=("parallel", "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(b // 8, n1 // t1),
            in_specs=[in_spec, in_spec], out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b * LANES, n1),
                                            jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
            interpret=_pc._INTERPRET,
        )(vr, vi)
    return run_p0


@functools.lru_cache(maxsize=None)
def _build_p2_direct(n: int, n1: int, inverse: bool, precision: str,
                     scale: float, out_mode: str = "fold"):
    """Two-pass finisher: (B*128, n1) [t2, t1] -> (B, n) ordered rows.

    ``out_mode``:
      "fold"    grid (B,) — the (128, n1) result block folds into a
                contiguous (8, n//8) block of the output viewed as
                (B*8, n//8) (bit-identical to (B, n)).
      "revisit" grid (B, 8) — row i of an (8, n) out block written per
                step (the device-ablated probe design, tools/probe_p2).
    """
    from smfft_tpu.config import debug_print
    debug_print(f"build hugefft p2d: n={n} n1={n1} inverse={inverse} "
                f"precision={precision} out={out_mode}")
    prec1 = _pc.resolve_scheme(precision, n1)
    prec2 = _pc.resolve_scheme(precision, LANES)
    nc1 = _pc.n_consts(n1, prec1)
    s2 = RF.stage2_consts(LANES, inverse, prec2)
    nc2 = len(s2)
    fold = out_mode == "fold"

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts1 = _pc.read_consts(refs[2:2 + nc1])
        wconsts = tuple(r[:] for r in refs[2 + nc1:2 + nc1 + nc2])
        tw = tuple(r[:] for r in refs[2 + nc1 + nc2:2 + nc1 + nc2 + 4])
        o_r, o_i = refs[2 + nc1 + nc2 + 4:]
        zr, zi = _pc.emit_fft(x_r[:], x_i[:], consts1, n=n1,
                              inverse=inverse, precision=prec1,
                              ordered=True)
        zr, zi = RF._apply_twiddle_b(zr, zi, *tw, 1, LANES, n1)
        cr, ci = RF._sublane_dft(zr, zi, wconsts, 1, LANES, n1, prec2)
        if fold:
            o_r[:] = cr.reshape(8, n // 8)
            o_i[:] = ci.reshape(8, n // 8)
        else:
            i = pl.program_id(1)
            o_r[pl.ds(i, 1), :] = cr.reshape(1, n)
            o_i[pl.ds(i, 1), :] = ci.reshape(1, n)

    if fold:
        in_spec = pl.BlockSpec((LANES, n1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((8, n // 8), lambda b: (b, 0),
                                memory_space=pltpu.VMEM)
        grid_of = lambda b: (b,)
        dims = ("arbitrary",)
    else:
        in_spec = pl.BlockSpec((LANES, n1), lambda g, i: (g * 8 + i, 0),
                               memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((8, n), lambda g, i: (g, 0),
                                memory_space=pltpu.VMEM)
        grid_of = lambda b: (b // 8, 8)
        dims = ("parallel", "arbitrary")
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2 + 4)
    consts1 = _pc.const_arrays(n1, inverse, prec1)
    tw_np = _twiddle_split_tables(n, n1, LANES, inverse, scale)

    @jax.jit
    def run_p2d(vr, vi):
        b = vr.shape[0] // LANES
        cost = pl.CostEstimate(flops=int(6 * n * np.log2(n) * b),
                               bytes_accessed=b * n * 4 * 4,
                               transcendentals=0)
        cp = None
        if not _pc._INTERPRET:
            cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT,
                                      dimension_semantics=dims)
        if fold:
            out_shape = (jax.ShapeDtypeStruct((b * 8, n // 8),
                                              jnp.float32),) * 2
        else:
            out_shape = (jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2
        o_r, o_i = pl.pallas_call(
            kernel, grid=grid_of(b),
            in_specs=[in_spec, in_spec] + const_specs,
            out_specs=(out_spec, out_spec),
            out_shape=out_shape, cost_estimate=cost, compiler_params=cp,
            interpret=_pc._INTERPRET,
        )(vr, vi, *(jnp.asarray(c) for c in consts1),
          *(jnp.asarray(c) for c in s2),
          *(jnp.asarray(t) for t in tw_np))
        return o_r.reshape(b, n), o_i.reshape(b, n)
    return run_p2d


def _outer_twiddle_tables(n: int, c1: int, inverse: bool, scale: float):
    """The N-decomposition twiddle W_N^(t2*k1) split over k1's lane
    digit: G1 (128, c1) and G2 (128, 128) fp64-computed fp32-rounded;
    ``scale`` folds into G1 exactly."""
    sign = 2j * np.pi / n if inverse else -2j * np.pi / n
    t2 = np.arange(LANES, dtype=np.int64)[:, None]
    a = np.arange(c1, dtype=np.int64)[None, :]
    bdig = np.arange(LANES, dtype=np.int64)[None, :]
    g1 = np.exp(sign * ((t2 * a * LANES) % n)) * scale
    g2 = np.exp(sign * ((t2 * bdig) % n))
    return (g1.real.astype(np.float32), g1.imag.astype(np.float32),
            g2.real.astype(np.float32), g2.imag.astype(np.float32))


def _twiddle_rows_epilogue(ar, ai, g1r, g1i, g2r, g2i, c1: int):
    """Multiply (sb, m) ordered rows by W_N^(t2*k1), t2 = the row's
    slice of the G tables (selected by the caller's block index map).

    k1 = a*128 + b splits the factor as G1[t2, a] * G2[t2, b]; the rows
    view as (sb, c1, 128) so the whole multiply is two 3-D broadcast
    complex products (an unrolled per-chunk loop at c1 = 256..1024
    bloated the Mosaic program and halved the pass)."""
    sb = ar.shape[0]
    a3r = ar.reshape(sb, c1, LANES)
    a3i = ai.reshape(sb, c1, LANES)
    hr, hi = g1r[:, :, None], g1i[:, :, None]      # (sb, c1, 1)
    fr, fi = g2r[:, None, :], g2i[:, None, :]      # (sb, 1, 128)
    wr = hr * fr - hi * fi
    wi = hr * fi + hi * fr
    out_r = a3r * wr - a3i * wi
    out_i = a3r * wi + a3i * wr
    return out_r.reshape(sb, -1), out_i.reshape(sb, -1)


@functools.lru_cache(maxsize=None)
def _build_p1(n: int, m: int, inverse: bool, precision: str,
              scale: float):
    """Three-pass middle: ordered M-FFT per row of (B*128, M) + the
    N-twiddle W_N^(t2*k1) epilogue, t2 = row % 128 picked by block
    index maps on the split tables.  The M-FFT is the plain fused row
    kernel when M is a supported row size (<= 16384), else the in-VMEM
    rowfour body (M = 2**15..2**17)."""
    from smfft_tpu import params as P
    from smfft_tpu.config import debug_print
    debug_print(f"build hugefft p1: n={n} m={m} inverse={inverse} "
                f"precision={precision}")
    c1 = m // LANES
    plain = m in P.SUPPORTED_C2C_SIZES and m < P1_ROWFOUR_MIN
    # 128 rows per block for the plain row kernel (the production-tuned
    # tile at 4096..8192 — 8-row blocks measured 49 GB/s, 12x slower);
    # every block then covers all t2 = 0..127 in order, so the N-twiddle
    # tables are whole-array consts.  m = 16384 drops to 64-row blocks
    # (128-row blocks + the G tables exceed VMEM: remote-compile OOM);
    # the rowfour body keeps its own tuned 8-row blocks.  Sub-128 blocks
    # select their t2 slice of the G tables by block index map.
    sb = (128 if m <= 8192 else 64) if plain else 8
    if plain:
        prec1 = _pc.resolve_scheme(precision, m)
        nc1 = _pc.n_consts(m, prec1)
        consts1_np = _pc.const_arrays(m, inverse, prec1)
        s2, tw_np = (), ()
    else:
        m1, m2 = RF.FACTORS[m]
        prec1 = _pc.resolve_scheme(precision, m1)
        prec2 = _pc.resolve_scheme(precision, m2)
        nc1 = _pc.n_consts(m1, prec1)
        consts1_np = _pc.const_arrays(m1, inverse, prec1)
        s2 = RF.stage2_consts(m2, inverse, prec2)
        tw_np = _twiddle_split_tables(m, m1, m2, inverse, 1.0)
    nc2 = len(s2)
    ntw = len(tw_np)

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts1 = _pc.read_consts(refs[2:2 + nc1])
        wconsts = tuple(r[:] for r in refs[2 + nc1:2 + nc1 + nc2])
        tw = tuple(r[:] for r in refs[2 + nc1 + nc2:2 + nc1 + nc2 + ntw])
        g1r, g1i, g2r, g2i = (
            r[:] for r in refs[2 + nc1 + nc2 + ntw:2 + nc1 + nc2 + ntw + 4])
        o_r, o_i = refs[2 + nc1 + nc2 + ntw + 4:]
        if plain:
            ar, ai = _pc.emit_fft(x_r[:], x_i[:], consts1, n=m,
                                  inverse=inverse, precision=prec1,
                                  ordered=True)
        else:
            ar, ai = RF._rowfour_body(
                x_r[:], x_i[:], consts1, wconsts, tw, n=m, n1=m1, n2=m2,
                sb=sb, inverse=inverse, prec1=prec1, prec2=prec2)
        o_r[:], o_i[:] = _twiddle_rows_epilogue(ar, ai, g1r, g1i,
                                                g2r, g2i, c1)

    spec = pl.BlockSpec((sb, m), lambda g: (g, 0),
                        memory_space=pltpu.VMEM)
    # t2 = (g*8 + i) % 128 advances 8 rows per grid step with period 16
    g1_spec = pl.BlockSpec((sb, c1), lambda g: (g % (LANES // sb), 0),
                           memory_space=pltpu.VMEM)
    g2_spec = pl.BlockSpec((sb, LANES), lambda g: (g % (LANES // sb), 0),
                           memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2
                                                             + ntw)
    g_np = _outer_twiddle_tables(n, c1, inverse, scale)

    @jax.jit
    def run_p1(vr, vi):
        rows = vr.shape[0]
        cost = pl.CostEstimate(
            flops=int(6 * m * np.log2(m)) * rows,
            bytes_accessed=rows * m * 4 * 4, transcendentals=0)
        cp = None
        if not _pc._INTERPRET:
            cp = pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT,
                                      dimension_semantics=("arbitrary",))
        return pl.pallas_call(
            kernel, grid=(rows // sb,),
            in_specs=[spec, spec] + const_specs
            + [g1_spec, g1_spec, g2_spec, g2_spec],
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((rows, m), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
            interpret=_pc._INTERPRET,
        )(vr, vi, *(jnp.asarray(c) for c in consts1_np),
          *(jnp.asarray(c) for c in s2),
          *(jnp.asarray(t) for t in tw_np),
          *(jnp.asarray(g) for g in g_np))
    return run_p1


def _p2c_tile(m: int) -> int:
    """Lane tile for the contraction pass: (128, CH) fp32 tiles of
    ~1 MB pipeline best (verify skill notes)."""
    t = max(LANES, min(m, 2048))
    while m % t:
        t //= 2
    return max(LANES, t)


@functools.lru_cache(maxsize=None)
def _build_p2_contract(m: int, ch: int, inverse: bool, precision: str,
                       n_outer: int = 0, scale: float = 1.0):
    """Contraction pass: the 128-point DFT contracting the t2 rows.
    (B*128, M) [t2-major] -> (B*128, M) [k2-major] = (B, N) natural.

    With ``n_outer`` (the five-pass inner finisher) the result tile is
    additionally multiplied by the OUTER twiddle W_No^(t2o*k1), where
    t2o = grid row % 128 and k1 = j2*M + j1 splits exactly into
    A[t2o, j2] * B2[t2o, j1] host tables (``scale`` folds into A)."""
    from smfft_tpu.config import debug_print
    debug_print(f"build hugefft p2c: m={m} ch={ch} inverse={inverse} "
                f"precision={precision} n_outer={n_outer}")
    prec2 = _pc.resolve_scheme(precision, LANES)
    s2 = RF.stage2_consts(LANES, inverse, prec2)
    nc2 = len(s2)
    ntw = 4 if n_outer else 0

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        wconsts = tuple(r[:] for r in refs[2:2 + nc2])
        o_r, o_i = refs[2 + nc2 + ntw:]
        cr, ci = RF._sublane_dft(x_r[:], x_i[:], wconsts, 1, LANES, ch,
                                 prec2)
        cr = cr.reshape(LANES, ch)
        ci = ci.reshape(LANES, ch)
        if n_outer:
            a_r, a_i, b_r, b_i = (r[:] for r in refs[2 + nc2:2 + nc2 + 4])
            # B2 rides in as its full (128, ch) sublane extent (Mosaic
            # rejects sub-8 sublane blocks — a (1, ch) block failed
            # lowering, VERDICT r4 missing #2); select row t2o with an
            # exact masked sum (one nonzero term per lane).
            t2o = jax.lax.rem(pl.program_id(0), LANES)
            sel = jax.lax.broadcasted_iota(jnp.int32, (LANES, ch),
                                           0) == t2o
            b_rr = jnp.sum(jnp.where(sel, b_r, 0.0), axis=0,
                           keepdims=True)
            b_ri = jnp.sum(jnp.where(sel, b_i, 0.0), axis=0,
                           keepdims=True)
            wr = a_r * b_rr - a_i * b_ri   # (128,1) x (1,ch) broadcast
            wi = a_r * b_ri + a_i * b_rr
            cr, ci = cr * wr - ci * wi, cr * wi + ci * wr
        o_r[:], o_i[:] = cr, ci

    spec = pl.BlockSpec((LANES, ch), lambda b, j: (b, j),
                        memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * nc2
    tw_specs, tw_np = [], ()
    if n_outer:
        # A[t2o, j2] = W_No^(t2o*j2*M) * scale as a (128*128, 1) column
        # (block (128, 1) selects t2o's j2-column); B2[t2o, j1] (128, M)
        # (block (1, ch) selects t2o's j1-chunk)
        sign = 2j * np.pi / n_outer if inverse else -2j * np.pi / n_outer
        t2o = np.arange(LANES, dtype=np.int64)[:, None]
        j2 = np.arange(LANES, dtype=np.int64)[None, :]
        j1 = np.arange(m, dtype=np.int64)[None, :]
        a_t = (np.exp(sign * ((t2o * j2 * m) % n_outer)) * scale
               ).reshape(LANES * LANES, 1)
        b_t = np.exp(sign * ((t2o * j1) % n_outer))
        tw_np = (a_t.real.astype(np.float32), a_t.imag.astype(np.float32),
                 b_t.real.astype(np.float32), b_t.imag.astype(np.float32))
        a_spec = pl.BlockSpec((LANES, 1), lambda b, j: (b % LANES, 0),
                              memory_space=pltpu.VMEM)
        b_spec = pl.BlockSpec((LANES, ch), lambda b, j: (0, j),
                              memory_space=pltpu.VMEM)
        tw_specs = [a_spec, a_spec, b_spec, b_spec]

    @jax.jit
    def run_p2c(vr, vi):
        rows = vr.shape[0]
        b = rows // LANES
        cost = pl.CostEstimate(
            flops=int(6 * LANES * np.log2(LANES) * b * m),
            bytes_accessed=rows * m * 4 * 4, transcendentals=0)
        cp = None
        if not _pc._INTERPRET:
            cp = pltpu.CompilerParams(
                vmem_limit_bytes=_VMEM_LIMIT,
                dimension_semantics=("parallel", "parallel")
                if not n_outer else ("arbitrary", "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(b, m // ch),
            in_specs=[spec, spec] + const_specs + tw_specs,
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((rows, m), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
            interpret=_pc._INTERPRET,
        )(vr, vi, *(jnp.asarray(c) for c in s2),
          *(jnp.asarray(t) for t in tw_np))
    return run_p2c


#: default finisher per size (device-measured, tools/probe_hugefft.py):
#: the two-pass P2d "revisit" out spec needs an (8, N) VMEM out window
#: (x2 buffering) so it caps at 2**19; "fold" fits everywhere but pays
#: a relayout (144 vs 198 GB/s end-to-end at 2**18); the three-pass
#: splits the work into two cheap streaming passes above that.
def _default_plan(n: int) -> str:
    if n <= 1 << 19:
        return "two:revisit"
    if n <= THREE_PASS_MAX:
        return "three"
    return "five"


def fft_huge_planar(vr: jnp.ndarray, vi: jnp.ndarray, *,
                    inverse: bool = False, precision: str = "highest",
                    scale: float = 1.0, plan: str | None = None):
    """Retile-free huge-N C2C FFT over the last axis, planar fp32
    in/out, natural order, unnormalized (``scale`` folds exactly into
    the twiddle tables).  N = 2**18..2**28; batched over leading axes.

    ``plan`` overrides the measured per-size default: "two:revisit",
    "two:fold", "three", or "five"."""
    n = vr.shape[-1]
    if vr.shape != vi.shape:
        raise ValueError(
            f"planar pair shapes differ: {vr.shape} vs {vi.shape}")
    m = n // LANES
    if n <= 1 << 17 or n > FIVE_PASS_MAX or (n & (n - 1)):
        raise ValueError(
            f"Error wrong FFT length! N={n}; hugefft supports powers of "
            f"two in [2**18, 2**28]")
    plan = plan or _default_plan(n)
    if plan == "five" and m // LANES < LANES:
        # the inner P1 lane DFT needs rows of at least LANES
        raise ValueError(
            f"five-pass plan needs N >= 2**21 (inner rows of at least "
            f"{LANES}); got N={n}")
    batch = vr.shape[:-1]
    vr = jnp.asarray(vr, jnp.float32).reshape(-1, n)
    vi = jnp.asarray(vi, jnp.float32).reshape(-1, n)
    b = vr.shape[0]
    pad = (-b) % 8
    if pad:
        vr = jnp.concatenate([vr, jnp.zeros((pad, n), jnp.float32)])
        vi = jnp.concatenate([vi, jnp.zeros((pad, n), jnp.float32)])
    zr, zi = _build_p0(n, m, _p0_tile(m))(vr, vi)
    if plan.startswith("two"):
        if n > TWO_PASS_MAX:
            raise ValueError(f"two-pass plan caps at N={TWO_PASS_MAX}")
        out_mode = plan.split(":", 1)[1] if ":" in plan else "revisit"
        o_r, o_i = _build_p2_direct(n, m, inverse, precision, scale,
                                    out_mode)(zr, zi)
    elif plan == "three":
        zr, zi = _build_p1(n, m, inverse, precision, scale)(zr, zi)
        o_r, o_i = _build_p2_contract(m, _p2c_tile(m), inverse,
                                      precision)(zr, zi)
        o_r = o_r.reshape(-1, n)
        o_i = o_i.reshape(-1, n)
    else:
        # five-pass: the M-length row FFTs of the three-pass are
        # themselves too large for VMEM, so each row runs its OWN
        # inner three-pass (P0 + P1 + P2c with the outer N-twiddle
        # fused into the inner contraction's epilogue).  m2 >= 128 was
        # validated at plan resolution above.
        m2 = m // LANES
        zr, zi = _build_p0(m, m2, _p0_tile(m2))(zr, zi)
        zr, zi = _build_p1(m, m2, inverse, precision, 1.0)(zr, zi)
        zr, zi = _build_p2_contract(m2, _p2c_tile(m2), inverse, precision,
                                    n_outer=n, scale=scale)(zr, zi)
        zr = zr.reshape(-1, m)
        zi = zi.reshape(-1, m)
        o_r, o_i = _build_p2_contract(m, _p2c_tile(m), inverse,
                                      precision)(zr, zi)
        o_r = o_r.reshape(-1, n)
        o_i = o_i.reshape(-1, n)
    if pad:
        o_r, o_i = o_r[:b], o_i[:b]
    return o_r.reshape(batch + (n,)), o_i.reshape(batch + (n,))
