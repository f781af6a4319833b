"""Direct and pair-rows real-transform kernels — the natural-order R2C
product path for n >= 4096 (rfft_pair_planar: 535/530 GB/s at
4096/8192 on v5e vs 463/310 for the pencil/digit-swap paths).

The classic half-size-complex real FFT (ops/pallas_real.py, mirroring
the reference's do_FFT_Stockham_R2C_C2R,
SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344) pays two
costs that dominate at large N on TPU: the even/odd LANE deinterleave
(device-measured as the largest term in the round-2 ablation,
BENCH_DETAILS "real ablation": no_deint 550 vs full 424 GB/s at
n=4096) and, for natural-order output, either the pencil ladder
(VPU-bound at L = 2048 planes) or a digit-swap relayout.

Two generations live here, both fully tested:

* the SINGLE-transform direct kernels (rfft_direct_planar /
  irfft_direct_planar) — measured 320-372 GB/s: a real transform
  only halves the ladder leaves/recon/transpose, not the
  twiddle/dots/pack, so per-byte compute is ~1.7x c2c's and cannot
  hide under the half-sized HBM stream;
* the PAIR-ROWS kernels (rfft_pair_planar / irfft_pair_planar) — two
  real rows ride ONE c2c pass as (re, im), halving per-transform
  compute back to c2c's ratio.  The forward is the product path at
  n >= 4096.  The inverse pair kernel is retained (tested, honest
  numbers: 300-365 GB/s — its input-side transposes and Hermitian
  row assembly exceed the pencil kernel's cost) but NOT dispatched:
  natural-order C2R stays on the pencil kernel (<= 4096, 430-646
  GB/s) and the digit-swap matmul kernel (8192+, 405).

These kernels instead run the real transform DIRECTLY at full length n
through the c2c two-factor machinery (n = n1 + 128*n2, c = n/128
chunks — ops/pallas_c2c.py), exploiting real-input/Hermitian structure
at every step:

Forward (R2C), per (tile, n) real block:
  1. sublane ladder over the c NATURAL lane chunks — no deinterleave
     at all; the imaginary planes start as None and the
     None-propagating ladder (pallas_c2c._plane_dft_list) elides the
     dead VPU work (the classic real-FFT ~2x saving);
  2. standard twiddle w_n^{k2*n1} (k2 = 0 trivial and skipped);
  3. TWO transposed symmetry-packed lane dots per chunk (exactly the
     ordered c2c path's MXU cost, _dot_t against _sym_matrix);
  4. mirror reconstruction of ONLY the TOP half k1 = 0..63 of
     _rows_recon's row-domain algebra — the packed half-spectrum
     X[k] = X[k1*c + k2], k < L = n/2 is exactly the k1 < 64 rows, so
     no 63-block sublane reversal is needed at all; slot 0 packs
     (DC, Nyquist) with Nyquist = the cos-column-64 row (static row
     slices only);
  5. ONE wide transpose (L, T) -> (T, L) — half the width of the c2c
     ordered transpose.

Inverse (C2R), per (tile, L) natural-order packed-spectrum block:
  1. one wide transpose to rows (L, T) and a free (64, c, T) chunk
     view; slot-0 (DC, Nyquist) unpacked;
  2. per chunk q, HALF-chunk lane transform A_q[j1] =
     0.5 * sum_{k1<64} X[k1*c+q] w_128^{+j1*k1} as TWO real dots
     against the 2x2-block real form [Or | -Oi; Oi | Or] of the
     half-DFT matrix (the re/im rows stack into one 128-deep
     contraction, so the MXU runs full-depth — same per-chunk cost as
     the forward);
  3. the Hermitian top half k1 >= 64 NEVER materializes: u[k2] =
     A_{k2} + w^{-j1} * conj(A_{(c-k2) mod c}) — a chunk-list
     permutation, a conjugation, and a column-broadcast complex
     multiply (k2 = 0: u[0] = 2*Re(A_0) - dc/2 + (-1)^{j1}*nyq/2,
     exactly real, so its imaginary plane enters the ladder as None);
  4. inverse twiddle w_n^{+j1*k2} as column tables, then the inverse
     sublane ladder over chunks -> output plane j2 holds samples
     x[j1 + 128*j2] — the even/odd re-interleave of the half-size
     formulation is absorbed into the index algebra (no gathers);
  5. concat the REAL planes (imaginary parts are the Hermitian
     residual and are never stored) and ONE wide transpose -> (T, n).
     The 0.5 scale baked into the A-dot matrices makes the output
     (n/2)-scaled — the reference's unnormalized C2R contract
     (SMFFT_Stockham_R2C_C2R/FFT.c:170-171).

Both kernels move 8 bytes/real-sample (4 in + 4 out) — half the c2c
traffic — with c2c-class MXU/VPU work, so they run at the c2c ordered
path's fraction of the HBM roofline.  Requires c = n/128 >= 8 (the
row-domain slices are c-row granular); n = 256/512 stay on the pencil
kernels (ops/pencil.py, already at roofline).
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
from smfft_tpu.ops.pallas_c2c import (
    LANES, _bdot, _chunks, _np_split_bf16, _np_split_bf16_3, _pack_rows,
    _plane_dft_list, _split_bf16, _sym_matrix, _tables, n_splits)

# Batch-tile rows per grid step (device-tuned on v5e; see
# tools/tune_real_direct.py)
_TILES = {1024: 128, 2048: 128, 4096: 128, 8192: 128, 16384: 64}


def _tile_for(n: int) -> int:
    return _TILES.get(n, 128)


def supported(n: int) -> bool:
    """Direct kernels need c = n/128 >= 8 (c-row-granular slices)."""
    return n >= 1024 and n in P.SUPPORTED_REAL_SIZES


# ---------------------------------------------------------------------------
# Forward R2C
# ---------------------------------------------------------------------------


def _rfft_consts(n: int, precision: str, half: bool = False):
    """[t_re, t_im, M (+ M splits)] — identical tables to the c2c kernel
    at size n (the direct transform IS the c2c decomposition applied to
    real data).  half=True bakes the pair-split's 1/2 into M so the
    split stage is pure adds (the slot-0 Nyquist patch pays a 2x)."""
    _, _, t_re, t_im, _, _ = _tables(n, inverse=False)
    m = _sym_matrix(n, inverse=False)
    if half:
        m = np.ascontiguousarray(0.5 * m, np.float32)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    base = [f32(t_re), f32(t_im), m]
    if precision in _pc._SPLIT3:
        base.extend(_np_split_bf16_3(m))
    elif precision in _pc._SPLIT2:
        base.extend(_np_split_bf16(m))
    return tuple(base)


@functools.lru_cache(maxsize=None)
def _build_rfft_direct(plan: P.FFTParams, tile_t: int, precision: str):
    """Fused direct R2C kernel: real (rows, n) -> NATURAL-order packed
    spectrum planar pair (rows, L), slot 0 = (DC, Nyquist) (reference
    layout, FFT-GPU-32bit-Stockham.cu:332-340)."""
    n = plan.n
    c = n // LANES
    L = n // 2
    h = 64 * c
    assert c >= 8
    consts = _rfft_consts(n, precision)
    n_c = len(consts)

    def kernel(*refs):
        x_ref = refs[0]
        cs = tuple(r[:] for r in refs[1:1 + n_c])
        t_re, t_im, m = cs[:3]
        m_splits = cs[3:] or None
        or_ref, oi_ref = refs[1 + n_c], refs[2 + n_c]

        x = x_ref[:]                       # (tile, n) natural real rows
        # 1. real-input sublane ladder over the natural lane chunks
        pre = _chunks(x, c)
        pim = [None] * c
        pre, pim = _plane_dft_list(pre, pim, -1.0)
        # 2. twiddle w_n^{k2*n1}; k2 = 0 row is all-ones (skipped), and
        #    plane 0's imaginary part stays structurally zero (None)
        for k2 in range(1, c):
            tr, ti = t_re[k2, :], t_im[k2, :]
            if pim[k2] is None:
                pre[k2], pim[k2] = pre[k2] * tr, pre[k2] * ti
            else:
                pre[k2], pim[k2] = (pre[k2] * tr - pim[k2] * ti,
                                    pre[k2] * ti + pim[k2] * tr)
        # 3. transposed packed lane dots (128, T) per chunk
        zq_r = [_pc._dot_t(m, pre[k], precision, m_splits)
                for k in range(c)]
        zq_i = [jnp.zeros((LANES, tile_t), jnp.float32) if pim[k] is None
                else _pc._dot_t(m, pim[k], precision, m_splits)
                for k in range(c)]
        wr = _pack_rows(zq_r, c)           # (c*128, T), row p*c + k2
        wi = _pack_rows(zq_i, c)
        # 4. top-half mirror recon (k1 = 1..63 aligned slices; see
        #    pallas_c2c._rows_recon — the bottom half / blockrev is the
        #    Hermitian mirror and is never built)
        u, v = wr[c:h], wi[h + c:]         # cos rows 1..63, sin 65..127
        xx, y = wr[h + c:], wi[c:h]
        top_r, top_i = u - v, xx + y
        # k1 = 0 block: cos-col-0 rows; slot 0 imag <- Nyquist
        #   (X[n/2] = cos-col-64 row of chunk 0 = wr[h])
        blk0_i = jnp.concatenate([wr[h:h + 1], wi[1:c]], axis=0)
        out_r = jnp.concatenate([wr[:c], top_r], axis=0)   # (L, T)
        out_i = jnp.concatenate([blk0_i, top_i], axis=0)
        # 5. one wide transpose lands natural order
        or_ref[:] = jnp.transpose(out_r)
        oi_ref[:] = jnp.transpose(out_i)

    in_spec = pl.BlockSpec((tile_t, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_t, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_c

    @jax.jit
    def run(x):
        b = x.shape[0]
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(b // tile_t,),
            in_specs=[in_spec] + const_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b, L), jnp.float32),
                       jax.ShapeDtypeStruct((b, L), jnp.float32)),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(x, *consts)

    return run


def rfft_direct_planar(x: jnp.ndarray, precision: str = "highest",
                       tile_t: int | None = None):
    """Direct single-pass R2C: real (B, n) fp32 -> NATURAL-order packed
    spectrum planar (B, n/2) pair, slot 0 = (DC, Nyquist).  n >= 1024."""
    n = x.shape[-1]
    if not supported(n):
        raise ValueError(
            f"Error wrong FFT length! direct r2c needs n >= 1024 in "
            f"{P.SUPPORTED_REAL_SIZES}, got {n}")
    precision = _pc.resolve_scheme_real(precision, n)
    rows = x.shape[0]
    pad = (-rows) % 8
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n), x.dtype)], axis=0)
    b = x.shape[0]
    tile = tile_t or _tile_for(n)
    while tile > 8 and b % tile:
        tile //= 2
    if b % tile:
        raise ValueError(f"batch {b} not divisible by tile {tile}")
    plan = P.plan_for(n, "forward", "r2c", True)
    o_r, o_i = _build_rfft_direct(plan, tile, precision)(
        x.astype(jnp.float32))
    if pad:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i


# ---------------------------------------------------------------------------
# Pair-rows forward R2C: TWO real transforms per c2c pass.
#
# The single-transform direct kernel above halves only the ladder
# leaves / recon / transpose, so its per-byte compute is ~1.7x c2c's and
# cannot hide under the real transform's half-sized HBM stream
# (device-measured 320-372 GB/s).  The classic fix: a batch of real
# FFTs pairs rows as one complex FFT — z = x_a + i*x_b with rows a/b
# the two halves of the block (FREE sublane slices, no interleave) —
# runs the full-efficiency ordered c2c machinery once for TWO
# transforms, then splits X_a[k] = (Z[k] + conj(Z[n-k]))/2,
# X_b[k] = (Z[k] - conj(Z[n-k]))/(2i) for k <= L only.  The mirror
# Z[(n-k) % n] is, in the packed row domain, a chunk permutation
# (k2 -> c-k2, middle-axis restack) plus c-granular row-block shifts —
# no lane gathers, no sublane reversals.  Per-transform compute is half
# the single-transform kernel's: the split replaces the v1 kernel's
# whole second pipeline.
# ---------------------------------------------------------------------------


def _perm3(a3, c):
    """Middle-axis chunk mirror: out[:, j, :] = a3[:, (c-j) % c, :]."""
    k = a3.shape[0]
    return jnp.stack([a3[:, (c - j) % c, :] for j in range(c)],
                     axis=1).reshape(k * c, -1)


@functools.lru_cache(maxsize=None)
def _build_rfft_pair(plan: P.FFTParams, tile_t: int, precision: str):
    """Pair-rows R2C kernel: real (2*tile, n) block -> natural packed
    spectra (2*tile, L) planar pair; rows [0:tile] transform rows
    [0:tile] of the input, rows [tile:2*tile] the second half."""
    n = plan.n
    c = n // LANES
    L = n // 2
    h = 64 * c
    T = tile_t
    assert c >= 8
    consts = _rfft_consts(n, precision, half=True)
    n_c = len(consts)

    def kernel(*refs):
        x_ref = refs[0]
        cs = tuple(r[:] for r in refs[1:1 + n_c])
        t_re, t_im, m = cs[:3]
        m_splits = cs[3:] or None
        or_ref, oi_ref = refs[1 + n_c], refs[2 + n_c]

        x = x_ref[:]                       # (2T, n) real rows
        vr, vi = x[:T], x[T:]              # pair: z = row_a + i*row_b
        # full ordered-c2c front half: ladder, twiddle, transposed dots
        pre, pim = _chunks(vr, c), _chunks(vi, c)
        pre, pim = _plane_dft_list(pre, pim, -1.0)
        for k2 in range(1, c):
            tr, ti = t_re[k2, :], t_im[k2, :]
            pre[k2], pim[k2] = (pre[k2] * tr - pim[k2] * ti,
                                pre[k2] * ti + pim[k2] * tr)
        zq_r = [_pc._dot_t(m, pre[k], precision, m_splits)
                for k in range(c)]
        zq_i = [_pc._dot_t(m, pim[k], precision, m_splits)
                for k in range(c)]
        wr = _pack_rows(zq_r, c)           # (128c, T) packed products
        wi = _pack_rows(zq_i, c)
        wr3 = wr.reshape(128, c, T)
        wi3 = wi.reshape(128, c, T)

        # Z top rows (k1 = 0..63) — the aligned half of _rows_recon
        zr_top = jnp.concatenate(
            [wr3[0:1], wr3[1:64] - wi3[65:128]], axis=0)   # (64, c, T)
        zi_top = jnp.concatenate(
            [wi3[0:1], wr3[65:128] + wi3[1:64]], axis=0)

        # mirror Zm[k] = Z[(n-k) % n], k1 = 0..63: chunk-permute the
        # packed products once, then c-granular row-block shifts
        pwr = _perm3(wr3[1:128], c).reshape(127, c, T)
        pwi = _perm3(wi3[1:128], c).reshape(127, c, T)
        zblk = jnp.zeros((1, c, T), jnp.float32)
        # general branch (valid for k2 >= 1): Zm(k1,k2) = Z(127-k1,c-k2)
        zm_r_gen = pwr[0:64] + jnp.concatenate([pwi[64:127], zblk], 0)
        zm_i_gen = (jnp.concatenate([-pwr[64:127], zblk], 0)
                    + pwi[0:64])
        # k2 = 0 column: Zm(k1,0) = Z((128-k1) % 128, 0)
        colfix_r = jnp.concatenate(
            [wr3[0:1, 0:1], wr3[1:64, 0:1] + wi3[65:128, 0:1]], axis=0)
        colfix_i = jnp.concatenate(
            [wi3[0:1, 0:1], wi3[1:64, 0:1] - wr3[65:128, 0:1]], axis=0)
        k2mask = jax.lax.broadcasted_iota(
            jnp.int32, (1, c, 1), 1) == 0
        zm_r = jnp.where(k2mask, colfix_r, zm_r_gen)
        zm_i = jnp.where(k2mask, colfix_i, zm_i_gen)

        # split into the two packed spectra (flat (h, T) rows); the
        # 1/2 is baked into M, so these are pure adds
        zr_top = zr_top.reshape(h, T)
        zi_top = zi_top.reshape(h, T)
        zm_r = zm_r.reshape(h, T)
        zm_i = zm_i.reshape(h, T)
        xa_r = zr_top + zm_r
        xa_i = zi_top - zm_i
        xb_r = zi_top + zm_i
        xb_i = zm_r - zr_top
        # slot-0 Nyquist patches (DC lands correct automatically; the
        # raw packed rows carry the baked 1/2, so the patch pays a 2x)
        two = jnp.float32(2.0)
        xa_i = jnp.concatenate([wr[h:h + 1] * two, xa_i[1:]], axis=0)
        xb_i = jnp.concatenate([wi[h:h + 1] * two, xb_i[1:]], axis=0)

        # one wide transpose per planar output: lane-concat the two
        # spectra side by side first, so columns 0..T-1 land as rows
        # 0..T-1 (X_a) and T..2T-1 as X_b
        or_ref[:] = jnp.transpose(
            jnp.concatenate([xa_r, xb_r], axis=1))
        oi_ref[:] = jnp.transpose(
            jnp.concatenate([xa_i, xb_i], axis=1))

    in_spec = pl.BlockSpec((2 * T, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2 * T, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_c

    @jax.jit
    def run(x):
        b = x.shape[0]
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(b // (2 * T),),
            in_specs=[in_spec] + const_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b, L), jnp.float32),
                       jax.ShapeDtypeStruct((b, L), jnp.float32)),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(x, *consts)

    return run


def rfft_pair_planar(x: jnp.ndarray, precision: str = "highest",
                     tile_t: int | None = None):
    """Pair-rows R2C: real (B, n) fp32 -> NATURAL-order packed spectrum
    planar (B, n/2) pair (slot 0 = (DC, Nyquist)); n >= 1024.

    Internally each grid block transforms 2*tile rows as tile complex
    rows; the block-local pairing is invisible to the caller — row i of
    the output is the spectrum of row i of the input."""
    n = x.shape[-1]
    if not supported(n):
        raise ValueError(
            f"Error wrong FFT length! pair r2c needs n >= 1024 in "
            f"{P.SUPPORTED_REAL_SIZES}, got {n}")
    precision = _pc.resolve_scheme_real(precision, n)
    rows = x.shape[0]
    tile = tile_t or _tile_for(n)
    pad = (-rows) % (2 * tile)
    while pad >= rows and tile > 8:      # shrink tile for small batches
        tile //= 2
        pad = (-rows) % (2 * tile)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n), x.dtype)], axis=0)
    plan = P.plan_for(n, "forward", "r2c", True)
    o_r, o_i = _build_rfft_pair(plan, tile, precision)(
        x.astype(jnp.float32))
    if pad:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i


# ---------------------------------------------------------------------------
# Inverse C2R
# ---------------------------------------------------------------------------


def _dot_mat(m, x, precision, m_splits):
    """(128, 128) constant @ (128, T) data with the precision-scheme
    machinery of pallas_c2c (standard dims, constant on the left)."""
    dims = (((1,), (0,)), ((), ()))
    if m_splits is not None and n_splits(precision):
        if precision == "x5":
            mh, mm, ml = m_splits
            xh = x.astype(jnp.bfloat16)
            xm = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            return (_bdot(mh, xh, dims)
                    + (_bdot(mm, xh, dims) + _bdot(mh, xm, dims))
                    + (_bdot(mm, xm, dims) + _bdot(ml, xh, dims)))
        xh, xl = _split_bf16(x)
        if precision == "x4":
            mh, mm, ml = m_splits
            return (_bdot(mh, xh, dims) + _bdot(mh, xl, dims)
                    + (_bdot(mm, xh, dims) + _bdot(ml, xh, dims)))
        mh, ml = m_splits
        return _bdot(mh, xh, dims) + (_bdot(mh, xl, dims)
                                      + _bdot(ml, xh, dims))
    enum = _pc._PREC.get(precision, jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(m, x, dimension_numbers=dims,
                               precision=enum,
                               preferred_element_type=jnp.float32)


def _irfft_consts(n: int, precision: str):
    """Constant tables for the direct C2R kernel.

    M_r/M_i: the 2x2-block real form of the 0.5-scaled half-depth
    inverse lane DFT O[j1, k1] = 0.5*exp(+2pi i j1 k1/128), k1 < 64:
      A_r = O_r@Xr - O_i@Xi = [O_r | -O_i] @ [Xr; Xi]
      A_i = O_i@Xr + O_r@Xi = [O_i |  O_r] @ [Xr; Xi]
    wb: the Hermitian-merge column w^{-j1} = exp(-2pi i j1/128).
    tc: inverse twiddle columns tc[j1, k2] = exp(+2pi i j1 k2/n).
    alt: (-1)^{j1} Nyquist column.
    """
    j1 = np.arange(LANES, dtype=np.float64)[:, None]
    k1 = np.arange(64, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j1 * k1 / LANES
    o_r, o_i = 0.5 * np.cos(ang), 0.5 * np.sin(ang)
    m_r = np.concatenate([o_r, -o_i], axis=1)        # (128, 128)
    m_i = np.concatenate([o_i, o_r], axis=1)
    wb_ang = -2.0 * np.pi * j1 / LANES
    wb_r, wb_i = np.cos(wb_ang), np.sin(wb_ang)      # (128, 1)
    c = n // LANES
    k2 = np.arange(c, dtype=np.float64)[None, :]
    tc_ang = 2.0 * np.pi * j1 * k2 / n
    tc_r, tc_i = np.cos(tc_ang), np.sin(tc_ang)      # (128, c)
    alt = np.where(np.arange(LANES)[:, None] % 2 == 0, 1.0, -1.0)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    base = [f32(m_r), f32(m_i)]
    if precision in _pc._SPLIT3:
        base.extend(_np_split_bf16_3(base[0]))
        base.extend(_np_split_bf16_3(base[1]))
    elif precision in _pc._SPLIT2:
        base.extend(_np_split_bf16(base[0]))
        base.extend(_np_split_bf16(base[1]))
    base.extend([f32(wb_r), f32(wb_i), f32(tc_r), f32(tc_i), f32(alt)])
    return tuple(base)


@functools.lru_cache(maxsize=None)
def _build_irfft_direct(plan: P.FFTParams, tile_t: int, precision: str):
    """Fused direct C2R kernel: NATURAL-order packed spectrum planar
    (rows, L) pair -> natural real (rows, n), scaled by L = n/2."""
    n = plan.n
    c = n // LANES
    L = n // 2
    assert c >= 8
    consts = _irfft_consts(n, precision)
    n_c = len(consts)
    ns = n_splits(precision)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cs = tuple(r[:] for r in refs[2:2 + n_c])
        m_r, m_i = cs[:2]
        mr_splits = cs[2:2 + ns] or None
        mi_splits = cs[2 + ns:2 + 2 * ns] or None
        wb_r, wb_i, tc_r, tc_i, alt = cs[2 + 2 * ns:]
        o_ref = refs[2 + n_c]

        x_r, x_i = xr_ref[:], xi_ref[:]    # (tile, L) natural packed
        # 1. transpose to rows + free chunk view
        rr = jnp.transpose(x_r)            # (L, T) row k = X[k]
        ri = jnp.transpose(x_i)
        dc, nyq = rr[:1], ri[:1]           # slot 0 = (DC, Nyquist)
        ri = jnp.concatenate([jnp.zeros_like(nyq), ri[1:]], axis=0)
        vr = rr.reshape(64, c, tile_t)
        vi = ri.reshape(64, c, tile_t)
        # 2. half-depth lane dots per chunk (re/im stacked to full MXU
        #    depth)
        a_r, a_i = [], []
        for q in range(c):
            op = jnp.concatenate([vr[:, q, :], vi[:, q, :]], axis=0)
            a_r.append(_dot_mat(m_r, op, precision, mr_splits))
            a_i.append(_dot_mat(m_i, op, precision, mi_splits))
        # 3. Hermitian merge u[k2] = A_k2 + w^{-j1} conj(A_{c-k2});
        #    k2 = 0 is exactly real: 2 Re(A_0) - dc/2 + (-1)^j1 nyq/2
        u_r = [None] * c
        u_i = [None] * c
        u_r[0] = (a_r[0] + a_r[0]) - 0.5 * dc + alt * (0.5 * nyq)
        for k2 in range(1, c):
            mzr, mzi = a_r[c - k2], -a_i[c - k2]
            t2r = wb_r * mzr - wb_i * mzi
            t2i = wb_r * mzi + wb_i * mzr
            u_r[k2] = a_r[k2] + t2r
            u_i[k2] = a_i[k2] + t2i
        # 4. inverse twiddle columns (k2 = 0 trivial / skipped), then
        #    the inverse sublane ladder chunk -> output plane j2
        for k2 in range(1, c):
            tr, ti = tc_r[:, k2:k2 + 1], tc_i[:, k2:k2 + 1]
            u_r[k2], u_i[k2] = (u_r[k2] * tr - u_i[k2] * ti,
                                u_r[k2] * ti + u_i[k2] * tr)
        z_r, _ = _plane_dft_list(u_r, u_i, +1.0)
        # 5. real planes are the samples x[j1 + 128*j2]; imag planes are
        #    the Hermitian residual (~0) and are never materialized
        o_ref[:] = jnp.transpose(jnp.concatenate(z_r, axis=0))

    in_spec = pl.BlockSpec((tile_t, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_t, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_c

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(b // tile_t,),
            in_specs=[in_spec, in_spec] + const_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *consts)

    return run


def _dot_rowpack(m, x, precision, m_splits):
    """Row-packed product dot: (128, 128) constant contracted on dim 0
    with (128, T) data -> (128, T) packed products p[pk, t] =
    sum_k1 M[k1, pk] x[k1, t] (same precision machinery as _dot_t)."""
    dims = (((0,), (0,)), ((), ()))
    if m_splits is not None and n_splits(precision):
        if precision == "x5":
            mh, mm, ml = m_splits
            xh = x.astype(jnp.bfloat16)
            xm = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            return (_bdot(mh, xh, dims)
                    + (_bdot(mm, xh, dims) + _bdot(mh, xm, dims))
                    + (_bdot(mm, xm, dims) + _bdot(ml, xh, dims)))
        xh, xl = _split_bf16(x)
        if precision == "x4":
            mh, mm, ml = m_splits
            return (_bdot(mh, xh, dims) + _bdot(mh, xl, dims)
                    + (_bdot(mm, xh, dims) + _bdot(ml, xh, dims)))
        mh, ml = m_splits
        return _bdot(mh, xh, dims) + (_bdot(mh, xl, dims)
                                      + _bdot(ml, xh, dims))
    enum = _pc._PREC.get(precision, jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(m, x, dimension_numbers=dims,
                               precision=enum,
                               preferred_element_type=jnp.float32)


def _irfft_pair_consts(n: int, precision: str):
    """[M_inv (0.5-scaled packed sym matrix), (splits), tw_r, tw_i].

    M_inv: _sym_matrix(inverse) * 0.5 — contracted on its TIME dim so
    the packed products feed pallas_c2c._rows_recon directly.
    tw: the inverse twiddle as flat row columns tw[j1*c + k2] =
    exp(+2pi i j1 k2 / n), applied as one (n, 1)-broadcast cmul."""
    c = n // LANES
    m = np.ascontiguousarray(
        0.5 * _sym_matrix(n, inverse=True), np.float32)
    j1 = np.arange(LANES, dtype=np.float64)[:, None]
    k2 = np.arange(c, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * j1 * k2 / n
    tw_r = np.cos(ang).reshape(n, 1).astype(np.float32)
    tw_i = np.sin(ang).reshape(n, 1).astype(np.float32)
    base = [m]
    if precision in _pc._SPLIT3:
        base.extend(_np_split_bf16_3(m))
    elif precision in _pc._SPLIT2:
        base.extend(_np_split_bf16(m))
    base.extend([tw_r, tw_i])
    return tuple(base)


@functools.lru_cache(maxsize=None)
def _build_irfft_pair(plan: P.FFTParams, tile_t: int, precision: str):
    """Pair-rows C2R kernel: two natural packed spectra (2*tile, L)
    planar pair -> real (2*tile, n), each L-scaled.

    z = x_a + i*x_b, so Z[k] = X_a[k] + i*X_b[k] with the Hermitian
    bottom half Z[n-k] = conj(W[k]), W = X_a - i*X_b.  Both Z-top and
    W-top are cheap row combinations of the transposed inputs, and the
    bottom half is conj(reversed W) — in the k1-major row layout that
    reversal is 64 c-granular block slices plus a chunk permutation
    (the blockrev precedent from pallas_c2c._rows_recon; no sublane
    reversals).  The full (n, T) Z rows then run the inverse c2c from
    the row side: per chunk TWO row-packed symmetric dots (the c2c MXU
    budget for the two transforms — half of the 2x2-block A-dot
    formulation this replaces), pallas_c2c._rows_recon, one flat-row
    twiddle cmul, and the inverse plane ladder; output planes' real
    parts are x_a samples, imaginary parts x_b."""
    n = plan.n
    c = n // LANES
    L = n // 2
    T = tile_t
    assert c >= 8
    consts = _irfft_pair_consts(n, precision)
    n_c = len(consts)
    ns = n_splits(precision)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cs = tuple(r[:] for r in refs[2:2 + n_c])
        m_inv = cs[0]
        m_splits = cs[1:1 + ns] or None
        tw_r, tw_i = cs[1 + ns:]
        o_ref = refs[2 + n_c]

        xr, xi = xr_ref[:], xi_ref[:]      # (2T, L) packed spectra pair
        txr = jnp.transpose(xr)            # (L, 2T): cols 0..T-1 = X_a
        txi = jnp.transpose(xi)
        ra, rb = txr[:, :T], txr[:, T:]    # free lane slices
        ia, ib = txi[:, :T], txi[:, T:]
        dca, nyqa = ra[0:1], ia[0:1]       # slot 0 = (DC, Nyquist)
        dcb, nyqb = rb[0:1], ib[0:1]
        # Z-top = X_a + i X_b, W-top = X_a - i X_b (slot-0 unpacked)
        z_r = jnp.concatenate([dca, ra[1:] - ib[1:]], axis=0)
        z_i = jnp.concatenate([dcb, ia[1:] + rb[1:]], axis=0)
        w_r = jnp.concatenate([dca, ra[1:] + ib[1:]], axis=0)
        w_i = jnp.concatenate([-dcb, ia[1:] - rb[1:]], axis=0)

        # bottom rows r = 64c + j, j = 0..64c-1: Z[r] = conj(W[64c - j]).
        # Chunk-permute once, append the virtual Nyquist row W[64c] (its
        # k2=0 entry is nyq_w; other lanes only feed the k2=0-masked
        # branch and are never selected), then BOTH branch row sets are
        # c-granular block-reversed slices of the same extended array.
        def bottom(w3, nyqw):
            pw = _perm3(w3, c).reshape(64, c, T)
            pwx = jnp.concatenate(
                [pw, nyqw[None, :, :]], axis=0)          # (65, c, T)
            gen = jnp.concatenate(                        # k2 >= 1
                [pwx[63 - k1b:64 - k1b] for k1b in range(64)], axis=0)
            col = jnp.concatenate(                        # k2 == 0
                [pwx[64 - k1b:65 - k1b] for k1b in range(64)], axis=0)
            return jnp.where(k2mask, col, gen)

        k2mask = jax.lax.broadcasted_iota(jnp.int32, (1, c, 1), 1) == 0
        z3r_top = z_r.reshape(64, c, T)
        z3i_top = z_i.reshape(64, c, T)
        nyqw_r = jnp.broadcast_to(nyqa, (c, T))
        nyqw_i = jnp.broadcast_to(-nyqb, (c, T))
        bot_r = bottom(w_r.reshape(64, c, T), nyqw_r)
        bot_i = -bottom(w_i.reshape(64, c, T), nyqw_i)   # conj
        rows_r = jnp.concatenate(
            [z3r_top, bot_r], axis=0).reshape(n, T)
        rows_i = jnp.concatenate(
            [z3i_top, bot_i], axis=0).reshape(n, T)

        # inverse lane DFT per chunk: TWO row-packed dots (c2c budget)
        v3r = rows_r.reshape(LANES, c, T)
        v3i = rows_i.reshape(LANES, c, T)
        zq_r = [_dot_rowpack(m_inv, v3r[:, q, :], precision, m_splits)
                for q in range(c)]
        zq_i = [_dot_rowpack(m_inv, v3i[:, q, :], precision, m_splits)
                for q in range(c)]
        u_r, u_i = _pc._rows_recon(zq_r, zq_i)   # (128c, T) rows j1*c+k2
        # inverse twiddle w_n^{+j1*k2} as one flat-row cmul
        u_r, u_i = (u_r * tw_r - u_i * tw_i,
                    u_r * tw_i + u_i * tw_r)
        u3r = u_r.reshape(LANES, c, T)
        u3i = u_i.reshape(LANES, c, T)
        p_r, p_i = _plane_dft_list(
            [u3r[:, k2, :] for k2 in range(c)],
            [u3i[:, k2, :] for k2 in range(c)], +1.0)
        # plane j2's real part = x_a samples, imaginary part = x_b;
        # lane-concat re|im so ONE wide transpose lands rows 0..T-1 =
        # x_a and T..2T-1 = x_b
        o_ref[:] = jnp.transpose(jnp.concatenate(
            [jnp.concatenate(p_r, axis=0),
             jnp.concatenate(p_i, axis=0)], axis=1))

    in_spec = pl.BlockSpec((2 * T, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((2 * T, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_c

    vmem_mb = 116 if n >= 8192 else 100

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(b // (2 * T),),
            in_specs=[in_spec, in_spec] + const_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *consts)

    return run


def irfft_pair_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int,
                      precision: str = "highest",
                      tile_t: int | None = None):
    """Pair-rows C2R: NATURAL-order packed spectrum planar (B, n/2)
    pair -> real (B, n) scaled by n/2 (reference contract); n >= 1024.
    Row i of the output is the signal of spectrum row i."""
    if not supported(n):
        raise ValueError(
            f"Error wrong FFT length! pair c2r needs n >= 1024 in "
            f"{P.SUPPORTED_REAL_SIZES}, got {n}")
    if vr.shape[-1] != n // 2:
        raise ValueError(f"expected row width {n // 2}, got {vr.shape[-1]}")
    precision = _pc.resolve_scheme_real(precision, n)
    rows = vr.shape[0]
    tile = tile_t or _tile_for(n)
    pad = (-rows) % (2 * tile)
    while pad >= rows and tile > 8:
        tile //= 2
        pad = (-rows) % (2 * tile)
    if pad:
        zeros = jnp.zeros((pad, n // 2), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    plan = P.plan_for(n, "inverse", "c2r", True)
    out = _build_irfft_pair(plan, tile, precision)(
        vr.astype(jnp.float32), vi.astype(jnp.float32))
    return out[:rows] if pad else out


def irfft_direct_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int,
                        precision: str = "highest",
                        tile_t: int | None = None):
    """Direct single-pass C2R: NATURAL-order packed spectrum planar
    (B, n/2) pair -> real (B, n) scaled by n/2 (reference contract).
    n >= 1024."""
    if not supported(n):
        raise ValueError(
            f"Error wrong FFT length! direct c2r needs n >= 1024 in "
            f"{P.SUPPORTED_REAL_SIZES}, got {n}")
    if vr.shape[-1] != n // 2:
        raise ValueError(f"expected row width {n // 2}, got {vr.shape[-1]}")
    precision = _pc.resolve_scheme_real(precision, n)
    rows = vr.shape[0]
    pad = (-rows) % 8
    if pad:
        zeros = jnp.zeros((pad, n // 2), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    b = vr.shape[0]
    tile = tile_t or _tile_for(n)
    while tile > 8 and b % tile:
        tile //= 2
    if b % tile:
        raise ValueError(f"batch {b} not divisible by tile {tile}")
    plan = P.plan_for(n, "inverse", "c2r", True)
    out = _build_irfft_direct(plan, tile, precision)(
        vr.astype(jnp.float32), vi.astype(jnp.float32))
    return out[:rows] if pad else out
