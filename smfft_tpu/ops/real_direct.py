"""Direct and pair-rows real-transform kernels — the natural-order
large-N real-transform product paths (rfft_pair_planar /
irfft_pair_planar; dispatch thresholds in ops/pallas_real.py).

The classic half-size-complex real FFT (ops/pallas_real.py, mirroring
the reference's do_FFT_Stockham_R2C_C2R,
SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344) pays two
costs that dominate at large N on TPU: the even/odd LANE deinterleave
(device-measured as the largest term in the round-2 ablation,
BENCH_DETAILS "real ablation": no_deint 550 vs full 424 GB/s at
n=4096) and, for natural-order output, either the pencil ladder
(VPU-bound at L = 2048 planes) or a digit-swap relayout.

The PAIR-ROWS kernels eliminate both: two real rows ride ONE c2c pass
as z = x_a + i*x_b (rows a/b are the two halves of the grid block —
FREE sublane slices, no interleave anywhere), so per-transform compute
is exactly half a c2c transform's — the same compute-per-HBM-byte as
the full-roofline c2c paths.  Both directions are thin wrappers around
the UNMODIFIED ordered-c2c pipeline (pallas_c2c.emit_fft, tdot_rows
merge, 615-658 GB/s), plus a lane-domain Hermitian stage on half the
data:

* Forward (rfft_pair_planar): the ordered-c2c front (chunk ladder,
  twiddle, per-chunk transposed packed dots with the split's 1/2 baked
  into the DFT matrix), then the Hermitian split in the PACKED-PRODUCT
  ROW domain (_pair_rows_split): the spectrum mirror n-k maps to
  (127-k1, c-k2), i.e. a free chunk-list permutation plus static
  one-sublane-shifted block slices — no lane gathers/flips at all, and
  chunk 0 collapses to two contiguous 2x-scaled slices.  The
  natural-order Z is never materialized; slot 0 packs (DC, Nyquist).
  Device-measured 590-607 GB/s at n = 1024-8192 (vs 547/525 at
  4096/8192 for the earlier lane-domain split form).
* Inverse (irfft_pair_planar), two forms picked per size by the
  device-measured _IRFFT_FORM table:
  - "lanes" (_build_irfft_pair): assemble full-width Z in the lane
    domain (lower lanes are adds; upper lanes are per-chunk 128-lane
    flips + one-lane carries on half the data), then
    emit_fft(inverse, ordered) with the reference's (n/2)-scale
    contract folded into the 0.5-scaled matrix
    (SMFFT_Stockham_R2C_C2R/FFT.c:170-171).
  - "rows" (_build_irfft_pair2): the exact dual of the forward split —
    one wide INPUT transpose, recover the packed products per chunk
    with the inverted split combos (static sublane-shifted slices, no
    lane ops), inverse lane DFT as MXU dots emitting (T, 128) planes
    (transpose rides the matmul), inverse twiddle, sign=+1 ladder;
    natural output with no output-side transpose.

Earlier generations (git history) split in the packed ROW domain
before the wide transpose (chunk restacks, 64-block assemblies,
sublane-contracting dots) and measured 205-545 GB/s; the lane-domain
form reaches ~0.84-0.95x of the c2c ordered path's rate at the SAME
HBM traffic of 8 bytes/real-sample.

The SINGLE-transform direct kernels (rfft_direct_planar /
irfft_direct_planar, 320-372 GB/s) are retained as the fallback that
needs no row pairing: a real transform only halves the ladder
leaves/recon/transpose, not the twiddle/dots/pack, so per-byte compute
is ~1.7x c2c's and cannot hide under the half-sized HBM stream — the
measured case AGAINST direct real kernels and FOR the pair form.

All kernels require c = n/128 >= 8; n = 256/512 stay on the pencil
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
_TILES = {1024: 128, 2048: 128, 4096: 128, 8192: 128, 16384: 128}

# C2R pair kernel form: "rows" = row-domain product recovery
# (_build_irfft_pair2), "lanes" = lane-domain Hermitian assembly
# (_build_irfft_pair); "auto" picks the device-measured winner per size
# (v5e, post roll-flip fold: lanes 617/587 vs rows 571/551 at
# 4096/8192; rows 587/452 vs lanes 585/448 at 2048/16384 — the rows
# form's strided sublane unpack costs what it saves in flips at mid
# sizes).  Tools force a form for A/B timing.
_IRFFT_PAIR = "auto"
_IRFFT_FORM = {1024: ("rows", 128), 2048: ("rows", 256),
               4096: ("lanes", 128), 8192: ("lanes", 128),
               16384: ("rows", 128)}


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
# runs the UNMODIFIED ordered-c2c pipeline (pallas_c2c.emit_fft,
# tdot_rows merge) once for TWO transforms, then splits
# X_a[k] = (Z[k] + conj(Z[n-k]))/2, X_b[k] = (Z[k] - conj(Z[n-k]))/(2i)
# for k <= L in the LANE domain: the mirror Z[(n-k) % n] is one
# 128-lane flip per chunk plus a one-lane carry on HALF the data.
# (Earlier generations split in the packed ROW domain before the wide
# transpose — chunk restacks / 64-block assemblies there measured
# 480-545 GB/s vs this form's 550-580; see git history.)
# ---------------------------------------------------------------------------


def _pair_rows_split(zq_r, zq_i, c):
    """Row-domain Hermitian pair split of transposed packed products.

    Input: per-chunk (128, T) products of the HALF-scaled sym-packed
    lane DFT (rows p = 0..64 cosine, 65..127 sine 1..63), chunk k2.
    Output: four chunk lists (64, T) — (xa_r, xa_i, xb_r, xb_i) rows
    k1 = 0..63 of the packed spectra X_a / X_b at chunk k2, slot 0 =
    (DC, Nyquist).

    The spectrum mirror n-k maps (k1, k2) -> (127-k1, c-k2) for k2 >= 1
    and (128-k1, 0) for k2 = 0, so in the packed-product ROW domain the
    whole split is a free chunk-list permutation (q = c-k2) plus static
    one-sublane-shifted block slices — ZERO lane gathers, no carry
    concats, no blockrev (the lane-domain form's cost centers).  Chunk 0
    collapses completely: its mirror pairs each product row with itself,
    so X_a = 2*(A[0:64] + i*A[64:128]) and X_b likewise on B — two
    contiguous slices, the (DC, Nyquist) slot-0 packing included."""
    two = jnp.float32(2.0)
    xa_r = [None] * c
    xa_i = [None] * c
    xb_r = [None] * c
    xb_i = [None] * c
    a0, b0 = zq_r[0], zq_i[0]
    xa_r[0] = a0[0:64] * two
    xa_i[0] = a0[64:128] * two
    xb_r[0] = b0[0:64] * two
    xb_i[0] = b0[64:128] * two
    for k2 in range(1, c):
        a, b = zq_r[k2], zq_i[k2]
        ap, bp = zq_r[c - k2], zq_i[c - k2]
        # Z[k1*c+k2]/2 rows 0..63 (the standard recon combos)
        zlo_r = jnp.concatenate([a[0:1], a[1:64] - b[65:128]], axis=0)
        zlo_i = jnp.concatenate([b[0:1], a[65:128] + b[1:64]], axis=0)
        # Z[n-k]/2 = Z[(127-k1)*c + (c-k2)]/2: rows k1+1 of chunk c-k2
        # (k1 = 63 hits the self-conjugate p = 64 row)
        zm_r = jnp.concatenate([ap[1:64] + bp[65:128], ap[64:65]], axis=0)
        zm_i = jnp.concatenate([bp[1:64] - ap[65:128], bp[64:65]], axis=0)
        # X_a = Z/2 + conj(Zm)/2, X_b = -i*(Z/2 - conj(Zm)/2)
        xa_r[k2] = zlo_r + zm_r
        xa_i[k2] = zlo_i - zm_i
        xb_r[k2] = zlo_i + zm_i
        xb_i[k2] = zm_r - zlo_r
    return xa_r, xa_i, xb_r, xb_i


@functools.lru_cache(maxsize=None)
def _build_rfft_pair(plan: P.FFTParams, tile_t: int, precision: str):
    """Pair-rows R2C kernel: real (2*tile, n) block -> natural packed
    spectra (2*tile, L) planar pair; rows [0:tile] transform rows
    [0:tile] of the input, rows [tile:2*tile] the second half.

    Front = the unmodified ordered-c2c pipeline up to the per-chunk
    transposed packed dots (chunks -> radix ladder -> twiddle -> _dot_t,
    exactly pallas_c2c._emit_ordered_tdot_rows); the Hermitian split
    then runs in the packed-product ROW domain (_pair_rows_split) before
    the wide transposes — the natural-order Z is never materialized and
    no lane gathers/flips exist anywhere in the kernel."""
    n = plan.n
    c = n // LANES
    L = n // 2
    T = tile_t
    assert c >= 8
    consts = _rfft_consts(n, precision, half=True)
    n_c = len(consts)

    def kernel(*refs):
        x_ref = refs[0]
        cs = tuple(r[:] for r in refs[1:1 + n_c])
        t_re, t_im, m = cs[:3]
        m_splits = tuple(cs[3:]) or None
        or_ref, oi_ref = refs[1 + n_c], refs[2 + n_c]

        x = x_ref[:]                       # (2T, n) real rows
        z_r, z_i = x[:T], x[T:]            # pair: z = row_a + i*row_b
        pre, pim = _chunks(z_r, c), _chunks(z_i, c)
        pre, pim = _plane_dft_list(pre, pim, -1.0)
        for k2 in range(1, c):             # k2 = 0 row is all-ones
            tr, ti = t_re[k2, :], t_im[k2, :]
            pre[k2], pim[k2] = (pre[k2] * tr - pim[k2] * ti,
                                pre[k2] * ti + pim[k2] * tr)
        zq_r = [_pc._dot_t(m, pre[k], precision, m_splits)
                for k in range(c)]
        zq_i = [_pc._dot_t(m, pim[k], precision, m_splits)
                for k in range(c)]
        xa_r, xa_i, xb_r, xb_i = _pair_rows_split(zq_r, zq_i, c)

        def pack(zs):                      # rows k1*c + k2 -> (T, L)
            t = zs[0].shape[1]
            return jnp.transpose(jnp.stack(zs, axis=1).reshape(64 * c, t))
        # rows 0..T-1 = X_a, rows T..2T-1 = X_b (one sublane concat)
        or_ref[:] = jnp.concatenate([pack(xa_r), pack(xb_r)], axis=0)
        oi_ref[:] = jnp.concatenate([pack(xa_i), pack(xb_i)], axis=0)

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
    if precision in _pc._ACC:
        parts = _pc._ACC[precision]
        d = m.shape[1] // parts
        ps = [jax.lax.dot_general(
            m[:, s * d:(s + 1) * d], x[s * d:(s + 1) * d, :],
            dimension_numbers=dims,
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32) for s in range(parts)]
        return _pc._pairwise(ps)
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


def _irfft_pair_consts(n: int, precision: str):
    """[t_re, t_im, M*0.5 (+ splits)] — the ordered-inverse-c2c constant
    layout (pallas_c2c.const_arrays) with the packed sym matrix scaled
    by 0.5, which folds the reference's (n/2)-scale contract (inverse
    sum = n*z; we ship L*z = n/2*z) into the MXU pass for free."""
    _, _, t_re, t_im, _, _ = _tables(n, inverse=True)
    m = 0.5 * _sym_matrix(n, inverse=True)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    base = [f32(t_re), f32(t_im), f32(m)]
    if precision in _pc._SPLIT3:
        base.extend(_np_split_bf16_3(base[2]))
    elif precision in _pc._SPLIT2:
        base.extend(_np_split_bf16(base[2]))
    return tuple(base)


@functools.lru_cache(maxsize=None)
def _build_irfft_pair(plan: P.FFTParams, tile_t: int, precision: str):
    """Pair-rows C2R kernel: two natural packed spectra (2*tile, L)
    planar pair -> real (2*tile, n), each L-scaled.

    z = x_a + i*x_b, so Z[k] = X_a[k] + i*X_b[k] with the Hermitian
    upper half Z[L+m] = conj(X_a[L-m]) + i*conj(X_b[L-m]).  The whole
    assembly happens in the LANE domain on the natural (T, L) planar
    inputs — two full-width adds build u = Re-mirror / v = Im-mirror
    sources, and the upper lanes are per-chunk 128-lane flips of u/v
    with a one-lane carry (lane 0 of each flipped chunk comes from the
    next chunk; m = 0 is the Nyquist patch).  The assembled full-width
    (T, n) planar Z then runs the UNMODIFIED ordered-inverse-c2c
    pipeline (pallas_c2c.emit_fft, the 615-658 GB/s tdot_rows path) —
    no row-domain processing, no input-side transposes, no sublane-
    contracting dots (v3/v4's cost centers, device-measured 205-365
    GB/s).  The reference (n/2)-scale contract is folded into the
    0.5-scaled lane-DFT matrix.  Output rows 0..T-1 are the x_a
    signals (Re z), rows T..2T-1 x_b (Im z) — one sublane concat."""
    n = plan.n
    c = n // LANES
    L = n // 2
    T = tile_t
    assert c >= 8
    consts = _irfft_pair_consts(n, precision)
    n_c = len(consts)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cs = tuple(r[:] for r in refs[2:2 + n_c])
        o_ref = refs[2 + n_c]

        xr, xi = xr_ref[:], xi_ref[:]      # (2T, L) packed spectra pair
        xa_r, xb_r = xr[:T], xr[T:]        # free sublane slices
        xa_i, xb_i = xi[:T], xi[T:]
        dca, dcb = xa_r[:, 0:1], xb_r[:, 0:1]   # slot 0 = (DC, Nyq)
        nyqa, nyqb = xa_i[:, 0:1], xb_i[:, 0:1]
        # lower lanes k = 0..L-1: Z = X_a + i X_b (lane-0 slot unpacked
        # to the pure-DC value)
        zlo_r = jnp.concatenate([dca, xa_r[:, 1:] - xb_i[:, 1:]], axis=1)
        zlo_i = jnp.concatenate([dcb, xa_i[:, 1:] + xb_r[:, 1:]], axis=1)
        # upper lanes k = L + m: Z = rev(u) + i rev(v) with
        # u = Re X_a + Im X_b, v = Re X_b - Im X_a, rev(w)[m] = w[L-m];
        # per output chunk that is one 128-lane flip plus a one-lane
        # carry from the neighbouring chunk (m = 0 -> Nyquist patch)
        u = xa_r + xb_i
        v = xb_r - xa_i
        # one (2T, L) array halves the flip-gather op count vs separate
        # u/v chains (same element volume, bigger tiles per gather)
        uv = jnp.concatenate([u, v], axis=0)
        uvch = _chunks(uv, c // 2)
        nyquv = jnp.concatenate([nyqa, nyqb], axis=0)
        # flip + the 1-lane carry shift folded into ONE roll-gather
        # (idx = (128-j) % 128): lane j of the output chunk holds source
        # lane 128-j for j >= 1 and lane 0 is patched from the carry —
        # one gather + one 1-lane concat per chunk instead of a flip
        # gather + a 127-lane concat (device-timed +33 GB/s at n=8192)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (2 * T, LANES), 1)
        roll_idx = (LANES - lane_i) % LANES
        zhi_r, zhi_i = [], []
        for a in range(c // 2):
            lane0 = nyquv if a == 0 else uvch[c // 2 - a][:, 0:1]
            g = jnp.take_along_axis(uvch[c // 2 - 1 - a], roll_idx,
                                    axis=1)
            zhi = jnp.concatenate([lane0, g[:, 1:]], axis=1)
            zhi_r.append(zhi[:T])
            zhi_i.append(zhi[T:])
        z_r = jnp.concatenate([zlo_r] + zhi_r, axis=1)   # (T, n)
        z_i = jnp.concatenate([zlo_i] + zhi_i, axis=1)

        # unmodified ordered inverse c2c (0.5-scale baked into M)
        o_re, o_im = _pc.emit_fft(z_r, z_i, cs, n=n, inverse=True,
                                  precision=precision, ordered=True)
        o_ref[:] = jnp.concatenate([o_re, o_im], axis=0)

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


def _dot_it(k, x, precision, k_splits=None):
    """Inverse transposed-product dot: (128p, T) products -> (T, 128j)
    planes via dot_general contracting both axis 0 — the output-side
    transpose rides the MXU for free (mirror of pallas_c2c._dot_t)."""
    dims = (((0,), (0,)), ((), ()))
    if k_splits is not None and n_splits(precision):
        if precision == "x5":
            kh, km, kl = k_splits
            xh = x.astype(jnp.bfloat16)
            xm = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
            return (_bdot(xh, kh, dims)
                    + (_bdot(xh, km, dims) + _bdot(xm, kh, dims))
                    + (_bdot(xm, km, dims) + _bdot(xh, kl, dims)))
        xh, xl = _split_bf16(x)
        if precision == "x4":
            kh, km, kl = k_splits
            return (_bdot(xh, kh, dims) + _bdot(xl, kh, dims)
                    + (_bdot(xh, km, dims) + _bdot(xh, kl, dims)))
        kh, kl = k_splits
        return _bdot(xh, kh, dims) + (_bdot(xl, kh, dims)
                                      + _bdot(xh, kl, dims))
    enum = _pc._PREC.get(precision, jax.lax.Precision.HIGHEST)
    return jax.lax.dot_general(x, k, dimension_numbers=dims,
                               precision=enum,
                               preferred_element_type=jnp.float32)


def _irfft_pair2_consts(n: int, precision: str):
    """[tc_re, tc_im, K (+ K splits)] for the row-domain inverse pair
    kernel: tc = inverse twiddle rows (c, 128); K (128p, 128j) =
    (L/c/4) * inv(0.5 * forward sym-packed lane matrix) — the exact
    inverse of the forward product map with the reference's n/2 output
    scale, the 1/c ladder normalization, and the solve's 1/4 folded in.
    Inverting the fp32-rounded forward matrix in float64 also corrects
    its rounding."""
    _, _, tc_re, tc_im, _, _ = _tables(n, inverse=True)
    c = n // LANES
    L = n // 2
    m_half = 0.5 * _sym_matrix(n, inverse=False).astype(np.float64)
    k = (L / c / 4.0) * np.linalg.inv(m_half)
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    base = [f32(tc_re), f32(tc_im), f32(k)]
    if precision in _pc._SPLIT3:
        base.extend(_np_split_bf16_3(base[2]))
    elif precision in _pc._SPLIT2:
        base.extend(_np_split_bf16(base[2]))
    return tuple(base)


@functools.lru_cache(maxsize=None)
def _build_irfft_pair2(plan: P.FFTParams, tile_t: int, precision: str):
    """Row-domain pair-rows C2R kernel: two natural packed spectra
    (2*tile, L) planar pair -> real (2*tile, n), each L-scaled.

    The exact dual of the forward row-domain split: ONE wide input
    transpose lands the spectra in the row domain, where the inverse of
    the Hermitian split (_pair_rows_split) is the same free chunk-pair
    permutation plus static one-sublane-shifted block slices — the
    packed products A/B of each chunk are recovered with ZERO lane
    gathers/flips (the lane-domain assembly's cost center).  The
    inverse lane DFT then runs as per-chunk MXU dots that emit (T, 128)
    planes directly (_dot_it — the transpose rides the matmul), followed
    by the inverse twiddle and the sign=+1 plane ladder; the output is
    already natural, so there is no output-side transpose.  Scale
    contract (n/2), ladder 1/c, and the solve's 1/4 all live in K."""
    n = plan.n
    c = n // LANES
    L = n // 2
    T = tile_t
    assert c >= 8
    consts = _irfft_pair2_consts(n, precision)
    n_c = len(consts)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cs = tuple(r[:] for r in refs[2:2 + n_c])
        tc_re, tc_im, k_mat = cs[:3]
        k_splits = tuple(cs[3:]) or None
        o_ref = refs[2 + n_c]

        xr, xi = xr_ref[:], xi_ref[:]      # (2T, L) packed spectra pair
        g_r = jnp.transpose(xr)            # (L, 2T): row k, col = batch
        g_i = jnp.transpose(xi)            # (a rows 0..T-1, b rows T..)
        u_r = g_r.reshape(64, c, 2 * T)    # leading-dim reshape only
        u_i = g_i.reshape(64, c, 2 * T)
        two = jnp.float32(2.0)

        # per-chunk unscaled split inverses (zlo' = 2*zlo, zm' = 2*zm)
        zlo_r = [None] * c
        zlo_i = [None] * c
        zm_r = [None] * c
        zm_i = [None] * c
        for k2 in range(1, c):
            ur, ui = u_r[:, k2, :], u_i[:, k2, :]
            xa_r, xb_r = ur[:, :T], ur[:, T:]
            xa_i, xb_i = ui[:, :T], ui[:, T:]
            zlo_r[k2] = xa_r - xb_i
            zlo_i[k2] = xa_i + xb_r
            zm_r[k2] = xa_r + xb_i
            zm_i[k2] = xb_r - xa_i

        planes_r = [None] * c
        planes_i = [None] * c
        for k2 in range(c):
            if k2 == 0:                    # chunk 0: contiguous slices
                ur, ui = u_r[:, 0, :], u_i[:, 0, :]
                at = two * jnp.concatenate([ur[:, :T], ui[:, :T]], axis=0)
                bt = two * jnp.concatenate([ur[:, T:], ui[:, T:]], axis=0)
            else:
                q = c - k2
                at = jnp.concatenate(
                    [two * zlo_r[k2][0:1],
                     zlo_r[k2][1:] + zm_r[q][:63],
                     two * zm_r[q][63:64],
                     zlo_i[k2][1:] - zm_i[q][:63]], axis=0)
                bt = jnp.concatenate(
                    [two * zlo_i[k2][0:1],
                     zlo_i[k2][1:] + zm_i[q][:63],
                     two * zm_i[q][63:64],
                     zm_r[q][:63] - zlo_r[k2][1:]], axis=0)
            planes_r[k2] = _dot_it(k_mat, at, precision, k_splits)
            planes_i[k2] = _dot_it(k_mat, bt, precision, k_splits)

        for k2 in range(1, c):             # inverse twiddle (k2=0 ones)
            tr, ti = tc_re[k2, :], tc_im[k2, :]
            planes_r[k2], planes_i[k2] = (
                planes_r[k2] * tr - planes_i[k2] * ti,
                planes_r[k2] * ti + planes_i[k2] * tr)
        z_r, z_i = _plane_dft_list(planes_r, planes_i, +1.0)
        # natural output: rows 0..T-1 = a signals, T..2T-1 = b signals
        o_ref[:] = jnp.concatenate(
            [jnp.concatenate(z_r, axis=1),
             jnp.concatenate(z_i, axis=1)], axis=0)

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
    form, best_tile = _IRFFT_FORM.get(n, ("rows", 128))
    if _IRFFT_PAIR != "auto":
        form = _IRFFT_PAIR
    tile = tile_t or best_tile
    pad = (-rows) % (2 * tile)
    while pad >= rows and tile > 8:
        tile //= 2
        pad = (-rows) % (2 * tile)
    if tile < 128 and _IRFFT_PAIR == "auto" and not _pc._INTERPRET:
        # Mosaic rejects the rows form's 1+63-row assembly concats when
        # the batch tile is narrower than one lane tile ("offset
        # mismatch on non-concat dimension") — small batches take the
        # lane-domain form, which compiles at any tile
        form = "lanes"
    if pad:
        zeros = jnp.zeros((pad, n // 2), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    plan = P.plan_for(n, "inverse", "c2r", True)
    build = _build_irfft_pair2 if form == "rows" else _build_irfft_pair
    out = build(plan, tile, precision)(
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
