"""Fused VMEM-resident batched C2C FFT Pallas kernels — the product core.

TPU-native re-design of the reference's shared-memory device FFT
(do_SMFFT_CT_DIT, SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:334-532;
do_FFT_Stockham_mk6, SMFFT_Stockham_C2C/FFT-GPU-32bit-Stockham.cu:97-240):
one HBM read + one HBM write per transform, all butterfly work in VMEM.

Algorithm: two-factor decimation split N = C * 128 with the 128-point part
contracted on the LANE axis by a dense DFT matmul — the MXU is the TPU's
lane-mixing network, replacing the reference's warp shuffles — and the
C-point part computed by a recursive radix-8/4 ladder over register
planes on the VPU.  Complex arithmetic is planar fp32 (Mosaic has no complex
dtype); the lane DFT exploits the DFT matrix's mirror symmetry to run as
TWO real matmuls against one packed 128x128 matrix plus a cheap lane
reconstruction (see _sym_matrix), 2/3 of the Karatsuba complex product's
MXU work at identical precision.

Two mirrored kernels (Mosaic cannot relayout lanes<->sublanes for free, so
each single-pass kernel has one "block-permuted" side; the pair composes
into relayout-free pipelines, the TPU analogue of the reference's cheap
``fft_reorder=0`` mode, README.md:30-33):

  * kernel A (natural in -> revblock out):
      in  x[n] at view [b, n2, n1]        (n  = n1 + 128*n2, dense)
      out X[k] at view [b, k2, k1]        (k  = k1*C + k2,  "revblock")
      steps: sublane DFT_C over n2 -> k2; twiddle w_N^{k2*n1}; lane DFT_128
      over n1 -> k1.
  * kernel B (revblock in -> natural out): the exact mirror
      (lane DFT first, conjugate-ordered twiddle, sublane DFT last); as an
      inverse it consumes kernel A's output directly, giving a
      convolution-style roundtrip with zero reordering passes anywhere.

Natural-order output ("ordered") — the analogue of the reference's
in-kernel reorder network (FFT-GPU-32bit.cu:54-329, README.md:33-36):

  * N >= 1024: kernel A with the relayout in-kernel via ``tdot_rows``
    (_emit_ordered_tdot_rows): the MXU emits each chunk's packed
    lane-DFT product already TRANSPOSED via reversed dot_general
    dimension numbers (no extra MXU passes), one sublane interleave
    puts packed row p of chunk k2 at row p*c + k2, the mirror
    reconstruction runs in that ROW domain as static contiguous c-row
    block slices + wide adds (zero lane gathers — the stage ablation
    in tools/tune_ordered2.py showed lane gathers were the entire
    ordered-path gap), and one wide transpose (free under the HBM
    stream) lands the natural layout.  617-641 GB/s on v5e vs 656
    unordered.
  * N = 256/512: the pencil kernel (ops/pencil.py) at full roofline —
    the c-row blocks above are sub-sublane-granule for c < 8.
  * N <= 128: every transform fits in one lane row (128/N packed per
    row for N < 128, mirroring the reference's 4x32 / 2x64 per-block
    packing, FFT-GPU-32bit.cu:588-595) and output is natural for free.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu import params as P

LANES = 128

_PREC = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}

_NO_COST = False

# Perf-ablation hook (debug only): "" normal; "no_plane" skips the sublane
# DFT; "no_twiddle" skips the main twiddle; "copy_only" skips everything.
_ABLATE = ""

# Ordered-merge implementation switch (debug/tuning; product = "tdot_rows").
#   "tdot_rows"    PRODUCT PATH: MXU emits transposed packed products
#                  (reversed dot_general dims, same 2 packed dots as the
#                  unordered path), one sublane interleave, mirror
#                  reconstruction in the ROW domain (static contiguous
#                  c-row block slices + wide adds, zero lane gathers),
#                  then one wide transpose.  Device-measured 627-641
#                  GB/s at N>=1024 (tools/tune_ordered2.py, v5e);
#                  N=256/512 dispatch to the pencil path instead
#                  (ops/pencil.py, full roofline).
#   "tdot_late"    like tdot_rows but mirror reconstruction LAST in the
#                  natural lane domain (slices/adds + within-tile static
#                  gather) — the lane gathers cost ~15-20% of roofline.
#   "swap"         digit_swap_merge (per-chunk transposes + sublane
#                  stack + wide transpose; also the n >= 8192 real path)
# (retired probe variants — tdot4, tdot_sym, mxu_small, widetrans,
#  rank3, concat/nostack probes — are recorded with their measurements
#  in the git history and tools/; they no longer ship in this module.)
_MERGE = "tdot_rows"

# Interpret mode runs the kernels through the Pallas interpreter (any
# backend, incl. CPU) — used by the test suite; real deployments compile
# through Mosaic.  Toggled via set_interpret(); affects new builds only.
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    if value != _INTERPRET:
        _build.cache_clear()
    _INTERPRET = value


# ---------------------------------------------------------------------------
# Constant tables (float64-accurate, fp32-rounded; cf. the reference's
# fast-math sincosf recomputation, FFT-GPU-32bit.cu:18-28).
# ---------------------------------------------------------------------------


def _dftmat(m: int, sign: float):
    a = np.arange(m, dtype=np.float64)
    ang = sign * 2.0 * np.pi * np.outer(a, a % m) / m
    return np.cos(ang), np.sin(ang)


def _tables(n: int, inverse: bool):
    """(f_re, f_im, t_re, t_im, g_re, g_im) for the (C, 128) split of n."""
    sign = +1.0 if inverse else -1.0
    c = max(1, n // LANES)
    if n >= LANES:
        g_re, g_im = _dftmat(LANES, sign)
    else:
        p = LANES // n
        dr, di = _dftmat(n, sign)
        g_re, g_im = np.kron(np.eye(p), dr), np.kron(np.eye(p), di)
    if c > 1:
        f_re, f_im = _dftmat(c, sign)
        k2 = np.arange(c, dtype=np.float64)[:, None]
        n1 = np.arange(LANES, dtype=np.float64)[None, :]
        tang = sign * 2.0 * np.pi * k2 * n1 / n
        t_re, t_im = np.cos(tang), np.sin(tang)
    else:
        f_re = f_im = np.zeros((1, 1))
        t_re = t_im = np.zeros((1, 1))
    f32 = lambda m: m.astype(np.float32)
    return tuple(map(f32, (f_re, f_im, t_re, t_im, g_re, g_im)))


def _np_split_bf16(m):
    """numpy fp32 -> (hi, lo) bf16 pair with m ~= hi + lo."""
    import jax.numpy as _jnp
    hi = np.asarray(_jnp.asarray(m).astype(_jnp.bfloat16))
    lo = np.asarray((_jnp.asarray(m)
                     - _jnp.asarray(hi).astype(_jnp.float32)
                     ).astype(_jnp.bfloat16))
    return hi, lo


def _np_split_bf16_3(m):
    """numpy fp32 -> (hi, mid, lo) bf16 triple with m == hi + mid + lo
    exactly (3 x 8 mantissa bits cover fp32's 24)."""
    import jax.numpy as _jnp
    mj = _jnp.asarray(m)
    hi = mj.astype(_jnp.bfloat16)
    r1 = mj - hi.astype(_jnp.float32)
    mid = r1.astype(_jnp.bfloat16)
    lo = (r1 - mid.astype(_jnp.float32)).astype(_jnp.bfloat16)
    return tuple(np.asarray(a) for a in (hi, mid, lo))


# MXU pass schemes for the fp32 lane matmul:
#   "highest" — lax.Precision.HIGHEST (6 bf16 passes, ~fp32-exact); the
#               numpy-grade default.
#   "high"    — CONTRACT tier, not a fixed scheme: the cheapest bf16
#               pass scheme that meets the reference's 1e-4 verification
#               gate (FFT.c:12, measured as max ABS error vs float64
#               numpy) at the plan's size.  Resolved statically per plan
#               via _HIGH_SCHEME/resolve_scheme to "x3"/"x4"/"x5"
#               (manual 3/4/5-pass splits below) or "highest".  Any
#               scheme with < 6 passes carries at least one dropped
#               bf16-split cross term of relative size ~2^-18, and the
#               transform's values grow ~sqrt(N) through the ladder, so
#               the largest sizes need the full 6 passes — there is no
#               cheaper bf16 scheme under the gate there (measured
#               sweep in BASELINE.md).
#   "fast"    — manual bf16x3 everywhere ("x3" scheme): 2-way splits,
#               hh + hl + lh; rel err ~2^-17 (fast-math class, ~2x
#               "highest" MXU throughput; outside the 1e-4 gate at
#               N >= 1024 — benchmark/throughput mode, matching what the
#               reference's fast-math would be).
#   "default" — single bf16 pass (unusable accuracy; parity knob —
#               api warns on use).
#
# Internal scheme tokens (what the dot routines actually see):
#   "x3" — x, m split 2-way; passes xh*mh + xh*ml + xl*mh.
#   "x4" — m split 3-way (exact), x 2-way; xh*(mh+mm+ml) + xl*mh.
#   "x5" — m split 3-way, x split 3-way; hh + hm + mh + mm + h*lo;
#          only xl*mh (~2^-18) dropped.
#
# The lane DFT itself uses the MIRROR SYMMETRY of the DFT matrix instead
# of the 3-mult Karatsuba complex product (for n >= 128): with
# G = C + iS, C[:, 128-k] = C[:, k] and S[:, 128-k] = -S[:, k], and
# S[:, 0] = S[:, 64] = 0 — so the 65 unique C columns and 63 unique
# nonzero S columns pack EXACTLY into one 128x128 matrix M.  The complex
# DFT then costs TWO real dots (xr@M, xi@M) plus a cheap lane/sublane
# mirror reconstruction, vs Karatsuba's three — a 1.5x MXU saving at
# identical precision.
_SPLIT2 = ("fast", "x3")        # 2-way constant split (2 extra arrays)
_SPLIT3 = ("x4", "x5")          # 3-way constant split (3 extra arrays)

# "high" resolution per core transform size: cheapest scheme measured
# inside the 1e-4 abs gate (sweep: tests/test_precision_high.py on CPU,
# tools/accuracy_sweep.py on chip).  Values grow ~sqrt(N) through the
# ladder, so larger N needs more passes.
_HIGH_SCHEME = {32: "x3", 64: "x3", 128: "x3", 256: "x4", 512: "x5",
                1024: "highest", 2048: "highest", 4096: "highest",
                8192: "highest"}


#: "exact" tier: HIGHEST product passes with the 128-term lane
#: contraction split into 16 sub-dots combined by a pairwise fp32 add
#: tree (_acc_dot).  The fp32 accumulator's sequential rounding over
#: the 128-deep contraction is the dominant error source of the whole
#: fused chain at n >= 1024 (tools/probe_accuracy_attrib.py); the
#: shortened chains cut measured error ~2.2-2.5x at identical MAC
#: count.  Below 1024 "highest" already sits at the fp32 floor, so the
#: tier only changes the lane dot where it matters.
EXACT_ACC_MIN = 1024


def resolve_scheme(precision: str, core_n: int) -> str:
    """Resolve the "high"/"exact" contract tiers to per-size scheme
    tokens."""
    if precision == "high":
        return _HIGH_SCHEME.get(core_n, "highest")
    if precision == "exact":
        return "acc16" if core_n >= EXACT_ACC_MIN else "highest"
    return precision


# Real transforms (r2c/c2r, keyed by REAL length): the half-size core
# runs at n/2 but output magnitudes match the full-length transform and
# the split/merge recombination adds ~1.5-2x amplification (measured,
# BENCH_DETAILS "accuracy" fast r2c vs c2c rows) — so the real map is a
# notch stricter than _HIGH_SCHEME at the core size.
_HIGH_SCHEME_REAL = {64: "x3", 128: "x3", 256: "x5"}


def resolve_scheme_real(precision: str, real_n: int) -> str:
    if precision == "high":
        return _HIGH_SCHEME_REAL.get(real_n, "highest")
    if precision == "exact":
        # the half-size core runs at real_n/2
        return "acc16" if real_n >= 2 * EXACT_ACC_MIN else "highest"
    return precision


def n_splits(precision: str) -> int:
    """Number of pre-split bf16 constant copies carried for a precision."""
    return 3 if precision in _SPLIT3 else (2 if precision in _SPLIT2 else 0)


def _sym_matrix(n: int, inverse: bool):
    """The packed symmetric lane-DFT matrix.

    For the 128-point lane transform: M = [C(:,0..64) | S(:,1..63)] —
    65 unique cosine columns + 63 unique nonzero sine columns = exactly
    128.  For kron-packed sub-128 transforms (block size nb = n < 128,
    p = 128/nb blocks) the same packing applies per block:
    M = I_p (x) [C_nb(:,0..nb/2) | S_nb(:,1..nb/2-1)] — per-block counts
    (nb/2+1) + (nb/2-1) = nb, so the packed matrix is always 128x128."""
    sign = +1.0 if inverse else -1.0
    nb = min(n, LANES)
    c_b, s_b = _dftmat(nb, sign)
    half = nb // 2
    blk = np.concatenate([c_b[:, :half + 1], s_b[:, 1:half]], axis=1)
    p = LANES // nb
    m = np.kron(np.eye(p), blk) if p > 1 else blk
    return np.ascontiguousarray(m, np.float32)


def const_arrays(n: int, inverse: bool, precision: str = "highest"):
    """Constant tables (numpy, so they stay trace-time constants and are
    safe to close over in cached builders).

    Layout (symmetry-packed scheme, all sizes):
      [t_re, t_im, M]  (+ M_hi, M_lo bf16 splits for "fast";
                        + M_hi, M_mid, M_lo for "high")
    """
    _, _, t_re, t_im, _, _ = _tables(n, inverse)
    m = _sym_matrix(n, inverse)
    base = [t_re, t_im, m]
    if precision in _SPLIT3:
        base.extend(_np_split_bf16_3(m))
    elif precision in _SPLIT2:
        base.extend(_np_split_bf16(m))
    return tuple(base)


def n_consts(n: int, precision: str = "highest") -> int:
    return 3 + n_splits(precision)


def read_consts(refs):
    """Read constant-table refs into values for emit_fft."""
    return tuple(r[:] for r in refs)


# ---------------------------------------------------------------------------
# In-kernel emitters — composable from user Pallas kernels (the parity of
# the reference's __device__ FFT core, README.md:10).
# ---------------------------------------------------------------------------


def _split_bf16(x):
    """Split fp32 into (hi, lo) bf16 pair with x ~= hi + lo."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _bdot(a, b, dims):
    return jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


def _dot_x3s(x, w_pair, dims):
    """Manual bf16x3 dot with the constant side pre-split 2-way."""
    wh, wl = w_pair
    xh, xl = _split_bf16(x)
    return _bdot(xh, wh, dims) + (_bdot(xh, wl, dims)
                                  + _bdot(xl, wh, dims))


def _dot_x4h(x, w_triple, dims):
    """Manual bf16x4 dot ("x4"): constant side pre-split 3-way (exact),
    data side 2-way.  xh contracts against the EXACT matrix (hi+mid+lo);
    the dropped terms are xl*(mid+lo) ~ 2^-18 relative, plus the 2-way
    data-split representation error ~2^-18."""
    wh, wm, wl = w_triple
    xh, xl = _split_bf16(x)
    return (_bdot(xh, wh, dims) + _bdot(xl, wh, dims)
            + (_bdot(xh, wm, dims) + _bdot(xh, wl, dims)))


def _dot_x5h(x, w_triple, dims):
    """Manual bf16x5 dot ("x5"): both sides split 3-way, lowest data
    chunk dropped.  Only xl*mh ~ 2^-18 is missing — one dropped-term
    error source vs "fast"'s three."""
    wh, wm, wl = w_triple
    xh = x.astype(jnp.bfloat16)
    r1 = x - xh.astype(jnp.float32)
    xm = r1.astype(jnp.bfloat16)
    return (_bdot(xh, wh, dims)
            + (_bdot(xh, wm, dims) + _bdot(xm, wh, dims))
            + (_bdot(xm, wm, dims) + _bdot(xh, wl, dims)))


def _split_dot(x, w_splits, dims, precision):
    if precision == "x5":
        return _dot_x5h(x, w_splits, dims)
    if precision == "x4":
        return _dot_x4h(x, w_splits, dims)
    return _dot_x3s(x, w_splits, dims)


# Split-accumulation schemes: lax.Precision.HIGHEST product passes, but
# the 128-term contraction is split into 8 (or 16) sub-dots combined by
# a PAIRWISE fp32 add tree.  The fp32 accumulator's sequential rounding
# over the 128-deep contraction is the single dominant error source of
# the whole fused chain at n >= 1024 (error attribution:
# tools/probe_accuracy_attrib.py — lane stage alone reproduces the full
# 1.4e-5/3.2e-5 abs error at 1024/4096, every other stage in float64
# changes nothing); shortening the accumulation chains to depth
# 16 + log2(8) cuts the measured error ~2.2-2.5x at identical MAC count.
_ACC = {"acc8": 8, "acc16": 16}


def _pairwise(parts):
    while len(parts) > 1:
        parts = [parts[i] + parts[i + 1] for i in range(0, len(parts), 2)]
    return parts[0]


def _acc_dot(x, m, parts: int, transposed: bool):
    """Split-contraction HIGHEST dot: x (T, K) against m (K, 128) —
    transposed=False gives x@m (T, 128); transposed=True gives (x@m)^T
    (128, T) via reversed dims (see _dot_t)."""
    k = m.shape[0]
    d = k // parts
    dims = ((((0,), (1,)) if transposed else ((1,), (0,))), ((), ()))
    ps = []
    for s in range(parts):
        ms = m[s * d:(s + 1) * d, :]
        xs = x[:, s * d:(s + 1) * d]
        a, b = (ms, xs) if transposed else (xs, ms)
        ps.append(jax.lax.dot_general(
            a, b, dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32))
    return _pairwise(ps)


def _sym_dot(x, m, m_splits, precision):
    """One real dot against the packed symmetric matrix M: (T, 128)."""
    if precision in _ACC:
        return _acc_dot(x, m, _ACC[precision], transposed=False)
    dims = (((1,), (0,)), ((), ()))
    if m_splits is not None and n_splits(precision):
        return _split_dot(x, m_splits, dims, precision)
    enum = _PREC.get(precision, jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(x, m, dimension_numbers=dims, precision=enum,
                               preferred_element_type=jnp.float32)


def _sym_recon_parts(p_r, p_i, nb: int = LANES):
    """Gathered mirror-recon components (x@C, x@S for both planes) from
    packed products P_r = xr@M, P_i = xi@M (block size nb, per-block
    frequency j = lane % nb, half = nb/2):
      (x@C)[k] = P[blk + min(j, nb-j)]
      (x@S)[k] = sign(j) * P[blk + half + (min(j, nb-j) % half)]
    with sign = 0 at j in {0, half}, +1 for j<half, -1 for j>half.
    Because C's columns are mirror-symmetric and S's anti-symmetric,
    these four components also yield the LANE-MIRRORED spectrum
    Z[(nb-j) % nb] with zero extra gathers (used by the fused r2c)."""
    shape = p_r.shape
    half = nb // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    j = lane % nb if nb < LANES else lane
    blk = lane - j
    min_j = jnp.minimum(j, nb - j)
    idx_c = blk + min_j
    idx_s = blk + half + (min_j % half)
    sign = jnp.where((j == 0) | (j == half), 0.0,
                     jnp.where(j < half, 1.0, -1.0))
    c_r = jnp.take_along_axis(p_r, idx_c, axis=-1)
    c_i = jnp.take_along_axis(p_i, idx_c, axis=-1)
    s_r = sign * jnp.take_along_axis(p_r, idx_s, axis=-1)
    s_i = sign * jnp.take_along_axis(p_i, idx_s, axis=-1)
    return c_r, c_i, s_r, s_i


def _sym_recon(p_r, p_i, nb: int = LANES):
    """Reconstruct (Xr, Xi) (T, 128) from packed products:
    Xr = x_r@C - x_i@S, Xi = x_r@S + x_i@C (see _sym_recon_parts)."""
    c_r, c_i, s_r, s_i = _sym_recon_parts(p_r, p_i, nb)
    return c_r - s_i, s_r + c_i


def flip_lanes(v):
    """Lane-axis reversal out[..., j] = v[..., 127-j] via a within-tile
    gather (lax.rev is not lowerable by Mosaic; take_along_axis is)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, v.shape, v.ndim - 1)
    return jnp.take_along_axis(v, (LANES - 1) - lane, axis=-1)


def _lane_dft(ar, ai, m, m_splits, precision, nb: int = LANES):
    """The full symmetric-packed complex lane DFT: two real dots plus
    mirror reconstruction (replaces the 3-dot Karatsuba complex product;
    2/3 the MXU work at identical per-dot precision)."""
    p_r = _sym_dot(ar, m, m_splits, precision)
    p_i = _sym_dot(ai, m, m_splits, precision)
    return _sym_recon(p_r, p_i, nb)


# None-propagating arithmetic: a None plane is an exact structural zero.
# Real-input ladders (the direct r2c kernel, ops/real_direct.py) start
# with every imaginary plane None; these helpers elide the dead VPU work
# the way the recursion's python-level structure allows (the classic
# real-FFT ~2x saving falls out automatically).  For never-None inputs
# the emitted op graph is bit-identical to the plain expressions.


def _nneg(a):
    return None if a is None else -a


def _nadd(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _nsub(a, b):
    if b is None:
        return a
    if a is None:
        return -b
    return a - b


def _nmul(a, s):
    return None if a is None else a * s


def _cmul_scalar(re, im, wr: float, wi: float):
    """(re + i*im) * (wr + i*wi) with python-scalar twiddles; exact
    special cases for 1, -1, +-i avoid needless VPU multiplies (the same
    trick as the reference's fused +-i*W last stage,
    FFT-GPU-32bit.cu:492-531).  re/im may be None (structural zero)."""
    if wi == 0.0:
        if wr == 1.0:
            return re, im
        if wr == -1.0:
            return _nneg(re), _nneg(im)
        return _nmul(re, wr), _nmul(im, wr)
    if wr == 0.0:
        if wi == 1.0:
            return _nneg(im), re
        if wi == -1.0:
            return im, _nneg(re)
        return _nmul(_nneg(im), wi), _nmul(re, wi)
    return (_nsub(_nmul(re, wr), _nmul(im, wi)),
            _nadd(_nmul(re, wi), _nmul(im, wr)))


def _w_scalar(sign: float, k: int, c: int):
    ang = sign * 2.0 * math.pi * k / c
    wr, wi = math.cos(ang), math.sin(ang)
    for exact in (0.0, 1.0, -1.0):  # snap so _cmul_scalar special-cases hit
        if abs(wr - exact) < 1e-12:
            wr = exact
        if abs(wi - exact) < 1e-12:
            wi = exact
    return wr, wi


def _plane_dft_list(pre, pim, sign: float, scale: float | None = None):
    """Recursive radix-8 (radix-4/2 fallback) DIT DFT over a python list
    of (T, 128) planes.

    Plane extraction/recombination is a leading-dim operation — no
    lane/sublane relayout — so the C-point sublane transform costs a few
    VPU flops/point/level with python-scalar twiddles.  Radix-4 halves the
    number of levels (and therefore intermediate-value traffic) vs radix-2,
    and radix-8 (_plane_dft8) cuts another third — the pencil kernels'
    ladders are VMEM-traffic bound in levels at large plane counts.
    This replaces both the reference's padded-shared-memory exchange stages
    (FFT-GPU-32bit.cu:456-490) and a Mosaic-hostile tiny matmul.

    ``scale`` folds a scalar multiply into the TOP level's twiddles: only
    the w == 1 branches pay an explicit multiply (~c/4 + 3 plane-mults
    instead of c for a separate output scaling — the reuse loop's
    per-iteration 1/sqrt(n) normalization rides almost free).
    """
    c = len(pre)
    if c == 1:
        if scale is not None:
            return [_nmul(pre[0], scale)], [_nmul(pim[0], scale)]
        return pre, pim
    if c % 8 == 0:
        return _plane_dft8(pre, pim, sign, scale)
    if c % 4 == 0:
        sub = [_plane_dft_list(pre[j::4], pim[j::4], sign) for j in range(4)]
        q = c // 4
        out_r = [None] * c
        out_i = [None] * c
        for k in range(q):
            # twiddled sub-transform outputs t_j = s * w_c^{j*k} * X_j[k]
            ws = [_w_scalar(sign, j * k, c) for j in range(4)]
            if scale is not None:
                ws = [(wr * scale, wi * scale) for wr, wi in ws]
            t = [ _cmul_scalar(sub[j][0][k], sub[j][1][k], *ws[j])
                  for j in range(4)]
            # radix-4 butterfly; +-i depends on direction
            a0r, a0i = _nadd(t[0][0], t[2][0]), _nadd(t[0][1], t[2][1])
            a1r, a1i = _nsub(t[0][0], t[2][0]), _nsub(t[0][1], t[2][1])
            a2r, a2i = _nadd(t[1][0], t[3][0]), _nadd(t[1][1], t[3][1])
            a3r, a3i = _nsub(t[1][0], t[3][0]), _nsub(t[1][1], t[3][1])
            # j3 = sign * i * a3  (multiply by -i for forward sign=-1)
            j3r, j3i = ((_nneg(a3i), a3r) if sign > 0
                        else (a3i, _nneg(a3r)))
            out_r[k],         out_i[k]         = (_nadd(a0r, a2r),
                                                  _nadd(a0i, a2i))
            out_r[k + q],     out_i[k + q]     = (_nadd(a1r, j3r),
                                                  _nadd(a1i, j3i))
            out_r[k + 2 * q], out_i[k + 2 * q] = (_nsub(a0r, a2r),
                                                  _nsub(a0i, a2i))
            out_r[k + 3 * q], out_i[k + 3 * q] = (_nsub(a1r, j3r),
                                                  _nsub(a1i, j3i))
        return out_r, out_i
    er, ei = _plane_dft_list(pre[0::2], pim[0::2], sign)
    orr, oi = _plane_dft_list(pre[1::2], pim[1::2], sign)
    out_r = [None] * c
    out_i = [None] * c
    for k in range(c // 2):
        wr, wi = _w_scalar(sign, k, c)
        if scale is not None:
            wr, wi = wr * scale, wi * scale
            er[k], ei[k] = _nmul(er[k], scale), _nmul(ei[k], scale)
        tr, ti = _cmul_scalar(orr[k], oi[k], wr, wi)
        out_r[k], out_i[k] = _nadd(er[k], tr), _nadd(ei[k], ti)
        out_r[k + c // 2] = _nsub(er[k], tr)
        out_i[k + c // 2] = _nsub(ei[k], ti)
    return out_r, out_i


_SQRT_HALF = math.sqrt(0.5)


def _dft4_n(t, sign):
    """Inline None-aware 4-point DIT butterfly on 4 (re, im) pairs."""
    a0r, a0i = _nadd(t[0][0], t[2][0]), _nadd(t[0][1], t[2][1])
    a1r, a1i = _nsub(t[0][0], t[2][0]), _nsub(t[0][1], t[2][1])
    a2r, a2i = _nadd(t[1][0], t[3][0]), _nadd(t[1][1], t[3][1])
    a3r, a3i = _nsub(t[1][0], t[3][0]), _nsub(t[1][1], t[3][1])
    j3r, j3i = (_nneg(a3i), a3r) if sign > 0 else (a3i, _nneg(a3r))
    return ((_nadd(a0r, a2r), _nadd(a0i, a2i)),
            (_nadd(a1r, j3r), _nadd(a1i, j3i)),
            (_nsub(a0r, a2r), _nsub(a0i, a2i)),
            (_nsub(a1r, j3r), _nsub(a1i, j3i)))


def _plane_dft8(pre, pim, sign: float, scale: float | None = None):
    """Radix-8 level of the plane ladder: one plane materialization
    where two radix-4/2 levels would pay two.  The pencil kernels'
    ladder is VMEM-traffic bound at large plane counts (each level
    reads+writes every plane), so fewer, fatter levels buy bandwidth;
    the w_8 = (1 -+ i)/sqrt(2) twiddles cost 2 plane-mults each."""
    c = len(pre)
    q = c // 8
    sub = [_plane_dft_list(pre[j::8], pim[j::8], sign) for j in range(8)]
    out_r = [None] * c
    out_i = [None] * c
    s8 = _SQRT_HALF
    for k in range(q):
        ws = [_w_scalar(sign, j * k, c) for j in range(8)]
        if scale is not None:
            ws = [(wr * scale, wi * scale) for wr, wi in ws]
        t = [ _cmul_scalar(sub[j][0][k], sub[j][1][k], *ws[j])
              for j in range(8)]
        ev = _dft4_n((t[0], t[2], t[4], t[6]), sign)
        od = _dft4_n((t[1], t[3], t[5], t[7]), sign)
        # X[m] = E[m] + w_8^m O[m], X[m+4] = E[m] - w_8^m O[m]
        for m in range(4):
            er, ei = ev[m]
            orr, oi = od[m]
            if m == 0:
                wr_, wi_ = orr, oi
            elif m == 2:                        # w = -+i
                wr_, wi_ = ((_nneg(oi), orr) if sign > 0
                            else (oi, _nneg(orr)))
            else:
                # w_8^1 = (1 -+ i)/sqrt2, w_8^3 = -(1 +- i)/sqrt2 (fwd)
                pr_ = _nmul(orr, s8)
                pi_ = _nmul(oi, s8)
                if m == 1:
                    wr_, wi_ = ((_nsub(pr_, pi_), _nadd(pi_, pr_))
                                if sign > 0 else
                                (_nadd(pr_, pi_), _nsub(pi_, pr_)))
                else:
                    wr_, wi_ = ((_nneg(_nadd(pr_, pi_)),
                                 _nsub(pr_, pi_))
                                if sign > 0 else
                                (_nsub(pi_, pr_),
                                 _nneg(_nadd(pi_, pr_))))
            out_r[k + m * q] = _nadd(er, wr_)
            out_i[k + m * q] = _nadd(ei, wi_)
            out_r[k + (m + 4) * q] = _nsub(er, wr_)
            out_i[k + (m + 4) * q] = _nsub(ei, wi_)
    return out_r, out_i


def _chunks(x, c):
    """Static lane-chunk list view of a (T, c*128) value — tile-granular
    slices, zero relayout (Mosaic supports neither lane-splitting reshapes
    nor cheap rank-3 views of wide rows)."""
    return [x[:, j * LANES:(j + 1) * LANES] for j in range(c)]


def _cat_lanes(chunks):
    return jnp.concatenate(chunks, axis=-1) if len(chunks) > 1 else chunks[0]


def digit_swap_split(x, c):
    """Inverse of digit_swap_merge: natural (T, c*128) -> c revblock
    chunks, chunks[k2][t, k1] = x[t, k1*c + k2].  One 2D transpose, a
    leading-dim split, and c small transposes back."""
    t = x.shape[0]
    xt = jnp.transpose(x).reshape(LANES, c, t)
    return [jnp.transpose(xt[:, k2, :]) for k2 in range(c)]


def digit_swap_merge(chunks):
    """Merge c equal-width (T, 128) streams into natural order
    out[t, k1*c + k2] = chunks[k2][t, k1] via the transpose unit:
    per-chunk 2D transpose -> (128, T), sublane stack + leading reshape
    (relayout-only) -> (c*128, T) whose row p IS element p, one 2D
    transpose back.  Cost is ~2 transpose passes/point independent of c,
    vs ~3*log2(c) gather ops/point for the riffle."""
    c = len(chunks)
    t = chunks[0].shape[0]
    zt = [jnp.transpose(ch) for ch in chunks]
    r = jnp.stack(zt, axis=1).reshape(c * LANES, t)
    return jnp.transpose(r)


def _dot_t(g, x, precision, g_splits=None):
    """Transposed-product dot: (x @ G)^T = (128, T) straight off the MXU
    via reversed dimension numbers — no relayout pass."""
    if precision in _ACC:
        return _acc_dot(x, g, _ACC[precision], transposed=True)
    dims = (((0,), (1,)), ((), ()))
    if g_splits is not None and n_splits(precision):
        if precision == "x5":
            gh, gm, gl = g_splits
            xh = x.astype(jnp.bfloat16)
            xm = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            return (_bdot(gh, xh, dims)
                    + (_bdot(gm, xh, dims) + _bdot(gh, xm, dims))
                    + (_bdot(gm, xm, dims) + _bdot(gl, xh, dims)))
        xh, xl = _split_bf16(x)
        if precision == "x4":
            gh, gm, gl = g_splits
            return (_bdot(gh, xh, dims) + _bdot(gh, xl, dims)
                    + (_bdot(gm, xh, dims) + _bdot(gl, xh, dims)))
        gh, gl = g_splits
        return _bdot(gh, xh, dims) + (_bdot(gh, xl, dims)
                                      + _bdot(gl, xh, dims))
    enum = _PREC.get(precision, jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(
        g, x, dimension_numbers=dims,
        precision=enum, preferred_element_type=jnp.float32)


def _emit_ordered_tdot_late(pre, pim, consts, precision):
    """Natural-order output with LATE mirror reconstruction.

    Per twiddled chunk the MXU emits the TRANSPOSED packed product
    P^T = (M^T a^T) (128, T) via reversed dot_general dims — same two
    packed dots per chunk as the unordered path, no extra MXU work and
    no per-chunk transpose passes.  The packed products are then
    interleaved (sublane stack) and wide-transposed ONCE into the
    natural-lane domain (T, c*128) where lane m = p*c + k2 holds packed
    frequency p of chunk k2.  The mirror reconstruction happens last,
    per output 128-lane tile j:

      out lane l = k1*c + k2 (k1 = j*q + a, q = 128/c) needs
        (x@C)[k1] = P[min(k1, 128-k1)]          (cosine half)
        (x@S)[k1] = sgn * P[64 + min(..) % 64]  (sine half)

      * j <  c/2 (k1 < 64): both are SAME-POSITION lanes of packed
        tiles j and j + c/2 — pure slices + add/sub, no data movement.
      * j >= c/2 (k1 >= 64): the mirror makes them a reversed static
        within-tile gather of tiles (c-1-j) / (c-1-j)+c/2, with the
        a == 0 lane patched from the next tile's first c lanes.

    Net cost vs the unordered path: ONE sublane interleave + ONE wide
    transpose + ~1 VPU select/arith pass — one full relayout pass fewer
    than digit_swap_merge (validated index algebra: tools/ prototypes).
    """
    c = len(pre)
    m = consts[2]
    m_splits = tuple(consts[3:]) or None
    zq_r = [_dot_t(m, pre[k], precision, m_splits) for k in range(c)]
    zq_i = [_dot_t(m, pim[k], precision, m_splits) for k in range(c)]
    t = zq_r[0].shape[1]

    def pack(zs):
        return jnp.transpose(jnp.stack(zs, axis=1).reshape(c * LANES, t))
    qr = pack(zq_r)  # (t, c*128): lane p*c + k2 = packed freq p, chunk k2
    qi = pack(zq_i)
    return _late_recon(qr, qi, c)


def _emit_ordered_tdot_rows(pre, pim, consts, precision):
    """Natural-order output with the mirror recon on the SUBLANE axis.

    Same two packed transposed dots per chunk as tdot_late, same sublane
    interleave to (c*128, T) with row p*c + k2 — but the mirror
    reconstruction runs BEFORE the wide transpose, in the row domain,
    where every access is a static contiguous c-row block slice:

      row k1*c + k2 of the natural-order result needs packed rows
      min(k1, 128-k1)*c + k2 (cosine) and (64 + min%64)*c + k2 (sine),
      so for whole k1-blocks:
        k1 = 1..63 :  out = wr[c:64c] -/+ wi[65c:128c]   (aligned slices)
        k1 = 65..127: the same combination with + / - swapped, in
                      REVERSED c-row-block order (m = 128-k1)

    i.e. 2 wide adds + 2 wide subs on half the data each, one 63-block
    sublane reversal (static slices), zero lane gathers / iotas /
    selects — the stage ablation (tools/tune_ordered2.py) showed the
    lane-domain gather recon was the entire ordered-path gap while the
    wide transpose is free under the HBM stream."""
    c = len(pre)
    m = consts[2]
    m_splits = tuple(consts[3:]) or None
    zq_r = [_dot_t(m, pre[k], precision, m_splits) for k in range(c)]
    zq_i = [_dot_t(m, pim[k], precision, m_splits) for k in range(c)]
    out_r, out_i = _rows_recon(zq_r, zq_i)
    return jnp.transpose(out_r), jnp.transpose(out_i)


def _pack_rows(zs, c):
    """Interleave c (128, T) chunk products into (c*128, T) with row
    p*c + k2 = packed row p of chunk k2 (one sublane stack).

    (An explicit two-level form — stride-8 group interleaves + a
    granule-aligned merge — was device-timed identical at every size:
    XLA canonicalizes the stack/reshape chain back to this exact
    lowering, so the stride-c stack IS the optimal known expression of
    the merge; see tools/ordered_merge_ablation.py.)"""
    t = zs[0].shape[1]
    return jnp.stack(zs, axis=1).reshape(c * LANES, t)


def _rows_recon(zq_r, zq_i):
    """Row-domain mirror reconstruction of transposed packed products:
    c chunk products (128, T) -> (c*128, T) rows k = k1*c + k2 of the
    reconstructed complex lane DFT (see _emit_ordered_tdot_rows)."""
    c = len(zq_r)
    wr = _pack_rows(zq_r, c)
    wi = _pack_rows(zq_i, c)
    h = 64 * c
    u, v = wr[c:h], wi[h + c:]       # cos rows 1..63, sin rows 65..127
    x, y = wr[h + c:], wi[c:h]
    top_r, top_i = u - v, x + y      # k1 = 1..63 blocks, aligned
    bsrc_r, bsrc_i = u + v, y - x    # k1 = 65..127 need m = 128-k1

    def blockrev(z):
        return jnp.concatenate(
            [z[j * c:(j + 1) * c] for j in range(62, -1, -1)], axis=0)
    out_r = jnp.concatenate(
        [wr[:c], top_r, wr[h:h + c], blockrev(bsrc_r)], axis=0)
    out_i = jnp.concatenate(
        [wi[:c], top_i, wi[h:h + c], blockrev(bsrc_i)], axis=0)
    return out_r, out_i


def _late_recon(qr, qi, c):
    """Mirror reconstruction in the merged natural-lane domain; see
    _emit_ordered_tdot_late.  qr/qi: (T, c*128), lane m = p*c + k2."""
    t = qr.shape[0]
    q = LANES // c
    lane = jax.lax.broadcasted_iota(jnp.int32, (t, LANES), 1)
    aa = lane // c
    kk2 = lane % c
    rev = jnp.clip((q - aa) * c + kk2, 0, LANES - 1)
    a0 = aa == 0

    def tile(z, j):
        return z[:, j * LANES:(j + 1) * LANES]

    out_r, out_i = [], []
    for j in range(c):
        if j < c // 2:
            c_r, c_i = tile(qr, j), tile(qi, j)
            s_r, s_i = tile(qr, c // 2 + j), tile(qi, c // 2 + j)
            if j == 0:  # k1 = 0 lanes: sine part is zero
                zero = jnp.float32(0.0)
                s_r = jnp.where(a0, zero, s_r)
                s_i = jnp.where(a0, zero, s_i)
            out_r.append(c_r - s_i)
            out_i.append(s_r + c_i)
        else:
            jc, jn = c - 1 - j, min(c - j, c - 1)
            jcs, jns = jc + c // 2, min(c - j + c // 2, c - 1)

            def mirror(z, ta, tb):
                g = jnp.take_along_axis(tile(z, ta), rev, axis=1)
                patch = jnp.take_along_axis(tile(z, tb), kk2, axis=1)
                return jnp.where(a0, patch, g)
            c_r, c_i = mirror(qr, jc, jn), mirror(qi, jc, jn)
            s_r, s_i = mirror(qr, jcs, jns), mirror(qi, jcs, jns)
            if j == c // 2:  # k1 = 64 lanes: sine part is zero
                zero = jnp.float32(0.0)
                s_r = jnp.where(a0, zero, s_r)
                s_i = jnp.where(a0, zero, s_i)
            out_r.append(c_r + s_i)   # sign(k1 > 64) = -1
            out_i.append(c_i - s_r)
    return _cat_lanes(out_r), _cat_lanes(out_i)


def emit_fft(xr, xi, consts, *, n: int, inverse: bool = False,
             precision: str = "highest", ordered: bool = False):
    """Kernel A: natural-layout input tile -> revblock-layout FFT.

    Args:
      xr, xi: (T, n_row) fp32 planar values, n_row = max(n, 128) — the
        natural row layout; lane-chunk j holds x[j*128 : (j+1)*128].
        For N < 128, rows pack 128/N transforms.
      consts: from read_consts / const_arrays (direction baked into tables).
    Returns:
      (o_re, o_im): (T, n_row) values; lane-chunk k2 holds X[k1*C + k2]
      at lane k1 ("revblock"; natural order already for N <= 128).
    """
    tile_t = xr.shape[0]
    c = max(1, n // LANES)
    sign = +1.0 if inverse else -1.0

    if _ABLATE == "copy_only":
        return xr, xi
    t_re, t_im, m = consts[:3]
    m_splits = tuple(consts[3:]) or None
    if c == 1:
        # single-chunk transforms (incl. kron-packed n < 128) are
        # natural-ordered already
        return _lane_dft(xr, xi, m, m_splits, precision,
                         nb=min(n, LANES))

    # sublane DFT_C over the lane-chunk axis n2 -> k2 (VPU recursive DIT
    # on chunk lists — leading-dim ops only, no transposes anywhere)
    pre, pim = _chunks(xr, c), _chunks(xi, c)
    if _ABLATE != "no_plane":
        pre, pim = _plane_dft_list(pre, pim, sign)
    if _ABLATE != "no_twiddle":
        # twiddle w_N^{k2*n1}: rows of the (C, 128) table per chunk
        for k2 in range(c):
            tr, ti = t_re[k2, :], t_im[k2, :]
            pre[k2], pim[k2] = (pre[k2] * tr - pim[k2] * ti,
                                pre[k2] * ti + pim[k2] * tr)
    if ordered and _MERGE == "tdot_late":
        return _emit_ordered_tdot_late(pre, pim, consts, precision)
    if ordered and _MERGE == "tdot_rows":
        return _emit_ordered_tdot_rows(pre, pim, consts, precision)
    # fold chunks into rows (k2-major) for one full-width lane matmul
    a_re = jnp.concatenate(pre, axis=0)
    a_im = jnp.concatenate(pim, axis=0)
    if _ABLATE == "no_matmul":
        o_re, o_im = a_re, a_im
    else:
        # lane DFT_128: (c*T, n1) x M -> packed products -> reconstruct
        o_re, o_im = _lane_dft(a_re, a_im, m, m_splits, precision)
    # rows back to lane chunks: chunk k2 = rows [k2*T, (k2+1)*T)
    out_r = [o_re[k2 * tile_t:(k2 + 1) * tile_t, :] for k2 in range(c)]
    out_i = [o_im[k2 * tile_t:(k2 + 1) * tile_t, :] for k2 in range(c)]
    if ordered:
        # natural order in-kernel via the digit-swap merge: sublane stack
        # + leading reshape (relayout-only) bracketed by 2D transposes —
        # cost independent of c, replacing the reference's reorder
        # network cost model (FFT-GPU-32bit.cu:54-329)
        return digit_swap_merge(out_r), digit_swap_merge(out_i)
    return _cat_lanes(out_r), _cat_lanes(out_i)


def emit_fft_rev(xr, xi, consts, *, n: int, inverse: bool = False,
                 precision: str = "highest"):
    """Kernel B: revblock-layout input tile -> natural-layout FFT (mirror).

    Consumes the layout emit_fft produces: lane-chunk j2 holds
    z[j1*C + j2] at lane j1.  Returns (T, n_row) values in natural layout.
    With inverse-direction consts this is the relayout-free inverse of
    emit_fft's forward — FFT-shift-free convolution pipelines use exactly
    this pair (the reference's fft_reorder=0 use case, README.md:30-33).
    """
    tile_t = xr.shape[0]
    c = max(1, n // LANES)
    sign = +1.0 if inverse else -1.0

    t_re, t_im, m = consts[:3]
    m_splits = tuple(consts[3:]) or None
    if c == 1:
        return _lane_dft(xr, xi, m, m_splits, precision,
                         nb=min(n, LANES))

    # lane DFT first: contract j1 -> m1 on all chunks folded into rows
    a_re = jnp.concatenate(_chunks(xr, c), axis=0)
    a_im = jnp.concatenate(_chunks(xi, c), axis=0)
    s_re, s_im = _lane_dft(a_re, a_im, m, m_splits, precision)
    pre = [s_re[j * tile_t:(j + 1) * tile_t, :] for j in range(c)]
    pim = [s_im[j * tile_t:(j + 1) * tile_t, :] for j in range(c)]
    # twiddle w_N^{j2*m1} per chunk
    for j2 in range(c):
        tr, ti = t_re[j2, :], t_im[j2, :]
        pre[j2], pim[j2] = (pre[j2] * tr - pim[j2] * ti,
                            pre[j2] * ti + pim[j2] * tr)
    # sublane DFT_C over j2 -> m2
    out_r, out_i = _plane_dft_list(pre, pim, sign)
    return _cat_lanes(out_r), _cat_lanes(out_i)


# ---------------------------------------------------------------------------
# pallas_call wrappers — standalone transforms (analogue of
# SMFFT_DIT_external / SMFFT_DIT_multiple, FFT-GPU-32bit.cu:534-572).
# ---------------------------------------------------------------------------


# Per-size batch tiles, tuned on v5e with device-side profiler timing
# (tools/tune*.py; the earlier host-differencing numbers were too noisy
# to tune against).  Larger tiles amortize per-grid-step overhead until
# the kernel's VMEM frame blows the scoped budget; the ordered path's
# relayout prefers different shapes than the pure-stream unordered path.
_TUNED_TILES = {32: 2048, 64: 2048, 128: 2048, 256: 1024, 512: 1024,
                1024: 512, 2048: 256, 4096: 256, 8192: 128, 16384: 64}
# (256/512 route to the pencil kernel; entries kept for the explicit
# tile_t override path)
_TUNED_TILES_ORDERED = {256: 1024, 512: 1024, 1024: 512, 2048: 128,
                        4096: 128, 8192: 128, 16384: 128}

# Ordered sizes served by the pencil-layout kernel (ops/pencil.py): the
# in-VMEM relayout + pure-VPU ladder hides fully under the HBM stream
# there (658/655 GB/s device-measured at 256/512), while the c-row block
# slices of tdot_rows are sub-sublane-granule for c < 8.  1024 rides it
# too: the radix-8 ladder keeps the pencil at 644.6 GB/s vs tdot_rows'
# 638.2 (device-timed); at n >= 2048 the ladder turns VPU-bound
# (484.7/279.8 at 2048/4096) and tdot_rows wins.
_PENCIL_ORDERED = (256, 512, 1024)


def default_tile(n: int, ordered: bool = False) -> int:
    """Batch-tile rows per grid step (tuned per size on v5e)."""
    if ordered and n in _TUNED_TILES_ORDERED:
        return _TUNED_TILES_ORDERED[n]
    if n in _TUNED_TILES:
        return _TUNED_TILES[n]
    c = max(1, n // LANES)
    return int(max(8, min(512, 1024 // c)))


@functools.lru_cache(maxsize=None)
def _build(plan: P.FFTParams, rev_in: bool, precision: str,
           tile_t: int, multiple_iters: int = 0, fused_scale: bool = False):
    """Jitted planar FFT specialized on a static :class:`FFTParams` plan —
    the L0 plan object is the cache key, exactly as the reference's
    template-parameter classes specialize each kernel instance
    (SM_FFT_parameters.cuh:1-390).

    rev_in=False -> kernel A (natural in, revblock out);
    rev_in=True  -> kernel B (revblock in, natural out).
    multiple_iters > 0 re-applies the core in VMEM (NREUSES analogue,
    FFT-GPU-32bit.cu:553-572) before the final store.
    fused_scale adds a scalar input multiplied into the data at load time
    (free normalization; also lets benchmark loops carry only a scalar so
    XLA cannot promote the HBM working set into VMEM).
    """
    from smfft_tpu.config import debug_print
    debug_print(f"build c2c kernel: plan={plan} rev_in={rev_in} "
                f"precision={precision} tile={tile_t} "
                f"multiple_iters={multiple_iters}")
    n = plan.core_n
    inverse = plan.direction == "inverse"
    ordered = plan.ordered
    c = max(1, n // LANES)
    emit = emit_fft_rev if rev_in else emit_fft
    n_extra = 1 if fused_scale else 0

    nc = n_consts(n, precision)

    n_row = max(n, LANES)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        consts = read_consts(refs[2:2 + nc])
        our_ref, oui_ref = refs[2 + nc + n_extra:][:2]
        # blocks keep the caller's natural (tile, n_row) shape — any
        # rank/row-width change outside the kernel is a layout-changing
        # XLA reshape (an extra HBM copy pass); inside, lane-chunk slices
        # are free
        xr = xr_ref[:]
        xi = xi_ref[:]
        if fused_scale:
            s = refs[2 + nc][0]
            if c > 1 and not multiple_iters:
                # fold the runtime scalar into the (c, 128) twiddle
                # tables (applied exactly once to every chunk in both
                # kernel A and B; fp32, no bf16 splits involved) — a
                # full-width input multiply costs ~8% on the ordered
                # path (device-measured, n=1024: 589 vs 636 GB/s)
                consts = (consts[0] * s, consts[1] * s) + consts[2:]
            else:
                xr = xr * s
                xi = xi * s
        if multiple_iters:
            scale = float(1.0 / math.sqrt(float(n)))
            sign = +1.0 if inverse else -1.0
            if c == 1:
                sc = np.float32(scale)

                def body(_, carry):
                    r, i = carry
                    o_r, o_i = emit(r, i, consts, n=n, inverse=inverse,
                                    precision=precision)
                    return o_r * sc, o_i * sc
                xr, xi = jax.lax.fori_loop(0, multiple_iters, body,
                                           (xr, xi))
            else:
                # carry the CHUNK LISTS through the loop: drops the
                # per-iteration lane-concat + re-slice relayout passes,
                # and the 1/sqrt(n) scale folds into the ladder's
                # top-level twiddles (near-free) — the same reworks
                # that recovered the pencil reuse curve (ops/pencil.py)
                t_re, t_im, m = consts[:3]
                m_splits = tuple(consts[3:]) or None

                def body(_, carry):
                    pre, pim = list(carry[0]), list(carry[1])
                    if _ABLATE == "copy_only":
                        sc = np.float32(scale)
                        return (tuple(p * sc for p in pre),
                                tuple(p * sc for p in pim))
                    if _ABLATE != "no_plane":
                        pre, pim = _plane_dft_list(pre, pim, sign, scale)
                    if _ABLATE != "no_twiddle":
                        for k2 in range(1, c):
                            tr, ti = t_re[k2, :], t_im[k2, :]
                            pre[k2], pim[k2] = (
                                pre[k2] * tr - pim[k2] * ti,
                                pre[k2] * ti + pim[k2] * tr)
                    a_re = jnp.concatenate(pre, axis=0)
                    a_im = jnp.concatenate(pim, axis=0)
                    if _ABLATE == "no_matmul":
                        o_re, o_im = a_re, a_im
                    else:
                        o_re, o_im = _lane_dft(a_re, a_im, m, m_splits,
                                               precision)
                    return (tuple(o_re[k * tile_t:(k + 1) * tile_t]
                                  for k in range(c)),
                            tuple(o_im[k * tile_t:(k + 1) * tile_t]
                                  for k in range(c)))

                pr, pi = jax.lax.fori_loop(
                    0, multiple_iters, body,
                    (tuple(_chunks(xr, c)), tuple(_chunks(xi, c))))
                xr = _cat_lanes(list(pr))
                xi = _cat_lanes(list(pi))
        kw = {} if rev_in else {"ordered": ordered}
        o_r, o_i = emit(xr, xi, consts, n=n, inverse=inverse,
                        precision=precision, **kw)
        our_ref[:] = o_r
        oui_ref[:] = o_i

    data_spec = pl.BlockSpec((tile_t, n_row),
                             lambda i: (i, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * nc
    scale_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if fused_scale
                   else [])
    consts = const_arrays(n, inverse, precision)

    @jax.jit
    def run(vr, vi, scale=None):
        b, _ = vr.shape
        grid = b // tile_t
        nffts = b * n_row // n
        cost = None if _NO_COST else pl.CostEstimate(
            flops=6 * n * (c + LANES) * max(1, multiple_iters) * nffts,
            bytes_accessed=b * n_row * 4 * 4,
            transcendentals=0)
        extra = (scale.reshape(1),) if fused_scale else ()
        compiler_params = None
        if not _INTERPRET:
            # raise the scoped-VMEM budget (v5e has 128 MB physical); the
            # default budget caps tiles small enough that per-grid-step
            # overhead dominates the HBM pipeline
            vmem_mb = 116 if n >= 16384 else 100
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[data_spec, data_spec] + const_specs + scale_specs,
            out_specs=(data_spec, data_spec),
            out_shape=(
                jax.ShapeDtypeStruct((b, n_row), jnp.float32),
                jax.ShapeDtypeStruct((b, n_row), jnp.float32)),
            cost_estimate=cost,
            compiler_params=compiler_params,
            interpret=_INTERPRET,
        )(vr, vi, *consts, *extra)

    return run


def _pick_tile(b: int, n: int, tile_t: int | None,
               ordered: bool = False) -> int:
    tile = tile_t or default_tile(n, ordered)
    while tile > 8 and b % tile:
        tile //= 2
    if b % tile:
        raise ValueError(f"batch rows {b} not divisible by tile {tile}")
    return tile


def _pad_rows(vr, vi):
    """Pad the row batch up to the 8-sublane granule so any nFFTs works
    (the reference accepts any nFFTs for N >= 128; ADVICE r1).  Returns
    (vr, vi, original_rows)."""
    b = vr.shape[0]
    pad = (-b) % 8
    if pad:
        zeros = jnp.zeros((pad, vr.shape[1]), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    return vr, vi, b


def fft_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int,
               inverse: bool = False, rev_in: bool = False,
               precision: str = "highest", tile_t: int | None = None,
               multiple_iters: int = 0, scale=None, ordered: bool = False,
               plan: P.FFTParams | None = None):
    """Planar batched FFT, single fused HBM pass (layouts per kernel A/B).

    vr, vi: fp32 (B_rows, n_row), n_row = max(n, 128); rows pack 128/n
    transforms when n < 128 (nFFTs divisibility mirrors the reference,
    FFT-GPU-32bit.cu:835-836).  Row batches are padded to the 8-sublane
    granule internally, so any row count works.  ``scale`` (scalar array)
    is multiplied into the input inside the kernel (fused, free).  The
    (n, direction, ordered) triple resolves to a cached
    :class:`FFTParams` plan that keys the kernel build.
    """
    if plan is None:
        plan = P.plan_for(n, "inverse" if inverse else "forward", "c2c",
                          ordered)
    if (plan.ordered and not rev_in and multiple_iters == 0
            and tile_t is None and n in _PENCIL_ORDERED
            and (not _INTERPRET or n <= 512)
            and precision in ("highest", "high")):
        # the pencil ladder is pure fp32 VPU ("highest"-class); other
        # precision modes keep the matmul kernel so their bf16 MXU
        # semantics are actually exercised.  Interpret mode caps the
        # route at n=512: the interpreter walks the n-plane ladder op
        # by op (minutes at n=1024 under shard_map), and tdot_rows
        # covers the same contract there.
        from smfft_tpu.ops import pencil
        return pencil.fft_pencil_planar(
            vr, vi, n, inverse=plan.direction == "inverse", scale=scale)
    precision = resolve_scheme(precision, n)
    vr, vi, rows = _pad_rows(vr, vi)
    tile = _pick_tile(vr.shape[0], n, tile_t, plan.ordered and not rev_in)
    run = _build(plan, rev_in, precision, tile, multiple_iters,
                 scale is not None)
    if scale is not None:
        o_r, o_i = run(vr, vi, jnp.asarray(scale, jnp.float32))
    else:
        o_r, o_i = run(vr, vi)
    if rows != o_r.shape[0]:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i


# ---------------------------------------------------------------------------
# Complex convenience wrappers (jit-safe; XLA stores complex64 planar on
# TPU so real/imag/complex are layout no-ops).
# ---------------------------------------------------------------------------


def _to_rows(x, n):
    batch_shape = x.shape[:-1]
    b = int(np.prod(batch_shape)) if batch_shape else 1
    pack = max(1, LANES // n)
    if b % pack:
        raise ValueError(
            f"n={n} packs {pack} transforms per row: batch must be a "
            f"multiple of {pack} (reference rule, FFT-GPU-32bit.cu:835-836)")
    rows = b // pack
    return (jnp.real(x).reshape(rows, max(n, LANES)),
            jnp.imag(x).reshape(rows, max(n, LANES)), batch_shape)


def fft_pallas(x: jnp.ndarray, inverse: bool = False, ordered: bool = True,
               precision: str = "highest",
               plan: P.FFTParams | None = None) -> jnp.ndarray:
    """Batched C2C FFT via the fused Pallas kernel.

    ordered=True returns natural-order output with the digit-swap relayout
    done in-kernel before the single HBM store; ordered=False returns the
    revblock layout out[..., k2*128 + k1] = X[k1*C + k2] in one fused pass
    (the fft_reorder=0 analogue; pair with ifft_pallas_rev for relayout-
    free roundtrips).
    """
    n = x.shape[-1]
    if plan is None:
        plan = P.plan_for(n, "inverse" if inverse else "forward", "c2c",
                          ordered)
    vr, vi, batch_shape = _to_rows(x, n)
    o_r, o_i = fft_planar(vr, vi, n, precision=precision, plan=plan)
    out = jax.lax.complex(o_r, o_i)
    return out.reshape(batch_shape + (n,))


def ifft_pallas_rev(x: jnp.ndarray, precision: str = "highest",
                    forward: bool = False) -> jnp.ndarray:
    """Inverse C2C FFT consuming revblock-layout input (the output of
    fft_pallas(ordered=False)), producing natural order in one fused pass.
    Unnormalized (reference contract, SURVEY.md quirk 3)."""
    n = x.shape[-1]
    plan = P.plan_for(n, "forward" if forward else "inverse", "c2c", False)
    vr, vi, batch_shape = _to_rows(x, n)
    o_r, o_i = fft_planar(vr, vi, n, rev_in=True, precision=precision,
                          plan=plan)
    out = jax.lax.complex(o_r, o_i)
    return out.reshape(batch_shape + (n,))
