"""R2C / C2R transforms on the Pallas C2C core — half-size packing trick.

Mirrors the reference's ``do_FFT_Stockham_R2C_C2R``
(SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344): a real
transform of length N runs as a half-size (L = N/2) complex transform on
packed (even, odd) samples plus a split/merge post-process with W(N, k)
twiddles (:289-328); element 0 packs (DC, Nyquist) into one complex slot
(:332-340); the C2R inverse is unnormalized — it returns (N/2)*x
(cf. FFT.c:170-171).

Two implementations: a compositional path for small sizes (half-size C2C
via the Pallas core with XLA pack/recombine around it) and, for n >= 256,
fully-fused single-pass kernels (_build_rfft / _build_irfft) where the
even/odd (de)interleave, the symmetry-packed half-size lane DFT (two real
dots), the mirror spectrum (a chunk permutation + lane flip — zero MXU
work), and the split/merge recombination all happen in one VMEM pass.
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


# ---------------------------------------------------------------------------
# Fully-fused R2C kernel (n >= 256): even/odd deinterleave, half-size C2C
# core, and the split recombination all in one VMEM pass.
#
# The split X[k] = 1/2(1 - iW^k) Z[k] + 1/2(1 + iW^k) conj(Z[(L-k) mod L])
# needs the mirrored spectrum Z[(L-k) mod L]; in revblock layout that is a
# chunk permutation (free trace-time list indexing) plus one lane flip
# (within-tile gather) of Z — no extra MXU work.  The P/Q recombination
# tables are VPU elementwise.  This replaces the reference's post-core
# H1/H2 loop (SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:289-340).
# ---------------------------------------------------------------------------

import functools

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops.pallas_c2c import (
    LANES, _SPLIT2, _SPLIT3, _lane_dft, _np_split_bf16,
    _np_split_bf16_3, _plane_dft_list, _sym_matrix, _tables,
    digit_swap_merge, digit_swap_split, flip_lanes, n_splits)
from smfft_tpu.ops import pallas_c2c as _pc


def _rfft_tables(n: int, precision: str = "highest"):
    """Constant tables for the fused r2c kernel of real length n.

    The half-size C2C lane DFT uses the symmetry-packed matrix M (two real
    dots, see pallas_c2c).  No mirror-DFT matrices are needed at all: the
    mirrored spectrum conj-side operand Z[(L-k) mod L] is a chunk
    permutation (free) plus one lane flip of Z — the column-reversed
    matmul x@Grev equals lane-flip(x@G), so the reference's second
    post-process operand (FFT-GPU-32bit-Stockham.cu:289-328) costs no MXU
    work here."""
    L = n // 2
    c = L // LANES
    # half-size c2c tables (forward): twiddle (c,128) and packed M
    _, _, t_re, t_im, _, _ = _tables(L, inverse=False)
    m = _sym_matrix(L, inverse=False)
    # P/Q recombination tables in revblock layout: index [k2, k1],
    # k = k1*c + k2, P = (1 - i W^k)/2, Q = (1 + i W^k)/2, W = e^{-2pi i/n}
    k1 = np.arange(LANES, dtype=np.float64)[None, :]
    k2 = np.arange(max(c, 1), dtype=np.float64)[:, None]
    k = k1 * max(c, 1) + k2
    w_re = np.cos(-2.0 * np.pi * k / n)
    w_im = np.sin(-2.0 * np.pi * k / n)
    # iW = i(w_re + i w_im) = -w_im + i w_re
    p_re, p_im = (1.0 + w_im) * 0.5, -0.5 * w_re
    q_re, q_im = (1.0 - w_im) * 0.5, +0.5 * w_re
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    base = [f32(t_re), f32(t_im), m]
    if precision in _SPLIT3:
        base.extend(_np_split_bf16_3(m))
    elif precision in _SPLIT2:
        base.extend(_np_split_bf16(m))
    base.extend(map(f32, (p_re, p_im, q_re, q_im)))
    return tuple(base)


def _deinterleave(x, rows):
    """(rows, 256) fp32 -> even lanes (rows, 128), odd lanes (rows, 128).

    Within-tile gathers only (cross-vreg gathers are unsupported): each
    128-lane tile is gathered at stride 2, then the two half-results are
    merged with a lane roll + select."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    idx_e = 2 * (lane % 64)
    idx_o = idx_e + 1
    t0, t1 = x[:, :LANES], x[:, LANES:]
    lo = lane < 64

    def merge(idx):
        g0 = jnp.take_along_axis(t0, idx, axis=-1)
        g1 = jnp.take_along_axis(t1, idx, axis=-1)
        return jnp.where(lo, g0, pltpu.roll(g1, 64, axis=1))

    return merge(idx_e), merge(idx_o)


def emit_rfft(x, cs, *, n: int, tile_t: int, precision: str = "highest",
              ordered: bool = False):
    """In-kernel R2C emitter, composable from user Pallas kernels (the
    real-transform counterpart of pallas_c2c.emit_fft).

    x: (tile_t, n) fp32 natural real rows; cs: the values of
    :func:`_rfft_tables` (read refs with ``tuple(r[:] for r in refs)``).
    Returns a planar pair (tile_t, n/2) holding the packed spectrum in
    revblock layout (natural order with ordered=True), slot k=0 carrying
    (DC, Nyquist) as (re, im) (reference layout,
    FFT-GPU-32bit-Stockham.cu:332-340)."""
    L = n // 2
    c = L // LANES
    n_split = n_splits(precision)
    t_re, t_im, m = cs[:3]
    m_splits = cs[3:3 + n_split] or None
    p_re, p_im, q_re, q_im = cs[3 + n_split:]
    # per-256-lane chunk deinterleave -> plane lists (zero reshapes;
    # any rank/row-width change outside the kernel is an HBM copy)
    pre, pim = [], []
    for j in range(c):
        if _pc._ABLATE == "no_deint":  # perf probe: wrong result
            zr = x[:, j * 256:j * 256 + LANES]
            zi = x[:, j * 256 + LANES:(j + 1) * 256]
        else:
            zr, zi = _deinterleave(x[:, j * 256:(j + 1) * 256],
                                   tile_t)
        pre.append(zr)
        pim.append(zi)
    if _pc._ABLATE == "copy_only":  # perf probe: wrong result
        return (jnp.concatenate(pre, axis=-1) if c > 1 else pre[0],
                jnp.concatenate(pim, axis=-1) if c > 1 else pim[0])

    # half-size C2C core, plane-list form
    s_r, s_i = _plane_dft_list(pre, pim, -1.0)
    # twiddle per plane (w_L^{k2*n1}); trivial when c == 1 (the table
    # is a zero placeholder in that case)
    if c > 1:
        for k2 in range(c):
            tr, ti = t_re[k2, :], t_im[k2, :]
            s_r[k2], s_i[k2] = (s_r[k2] * tr - s_i[k2] * ti,
                                s_r[k2] * ti + s_i[k2] * tr)
    # ONE symmetry-packed lane DFT (2 real dots); both the spectrum
    # AND its lane mirror come from the same four recon components
    # (C columns mirror-symmetric, S anti-symmetric):
    #   zf  = (cr - si) + i(sr + ci)
    #   zf[(128-k1)%128] = (cr + si) + i(ci - sr)   -- zero gathers
    # so the mirror operand rv costs only sign-combines plus a lane
    # roll per chunk (the global mirror is chunk-permute + 127-k1,
    # i.e. the (128-k1)%128 form rolled by -1).
    a_r = jnp.concatenate(s_r, axis=0)
    a_i = jnp.concatenate(s_i, axis=0)
    p_r = _pc._sym_dot(a_r, m, m_splits, precision)
    p_i = _pc._sym_dot(a_i, m, m_splits, precision)
    cr_, ci_, sr_, si_ = _pc._sym_recon_parts(p_r, p_i)
    zf_r, zf_i = cr_ - si_, sr_ + ci_
    zf_rc = [zf_r[k * tile_t:(k + 1) * tile_t] for k in range(c)]
    zf_ic = [zf_i[k * tile_t:(k + 1) * tile_t] for k in range(c)]
    if _pc._ABLATE == "no_mirror":  # perf probe: wrong result
        rv_rc, rv_ic = zf_rc, zf_ic
    else:
        zm_r, zm_i = cr_ + si_, ci_ - sr_
        zm_rc = [zm_r[k * tile_t:(k + 1) * tile_t] for k in range(c)]
        zm_ic = [zm_i[k * tile_t:(k + 1) * tile_t] for k in range(c)]
        # roll by -1 == +127 (pltpu.roll wants non-negative shifts)
        rv_rc = [zm_rc[0]] + [pltpu.roll(zm_rc[c - k2], 127, axis=1)
                              for k2 in range(1, c)]
        rv_ic = [zm_ic[0]] + [pltpu.roll(zm_ic[c - k2], 127, axis=1)
                              for k2 in range(1, c)]

    # X = P*Z + Q*conj(Zm), per chunk (P/Q table rows)
    if _pc._ABLATE == "no_recomb":  # perf probe: wrong result
        return (jnp.concatenate(zf_rc, axis=-1) if c > 1 else zf_rc[0],
                jnp.concatenate(zf_ic, axis=-1) if c > 1 else zf_ic[0])
    out_r, out_i = [], []
    for k2 in range(c):
        pr, pi = p_re[k2, :], p_im[k2, :]
        qr, qi = q_re[k2, :], q_im[k2, :]
        xr_ = (zf_rc[k2] * pr - zf_ic[k2] * pi) \
            + (rv_rc[k2] * qr + rv_ic[k2] * qi)
        xi_ = (zf_rc[k2] * pi + zf_ic[k2] * pr) \
            + (-rv_ic[k2] * qr + rv_rc[k2] * qi)
        if k2 == 0:
            # slot k=0 (lane 0 of chunk 0) packs (DC, Nyquist) =
            # (ReZ0 + ImZ0, ReZ0 - ImZ0); full-shape mask select
            lane = jax.lax.broadcasted_iota(
                jnp.int32, (tile_t, LANES), 1)
            at0 = lane == 0
            xr_ = jnp.where(at0, zf_rc[0] + zf_ic[0], xr_)
            xi_ = jnp.where(at0, zf_rc[0] - zf_ic[0], xi_)
        out_r.append(xr_)
        out_i.append(xi_)
    if ordered and c > 1:
        return digit_swap_merge(out_r), digit_swap_merge(out_i)
    return (jnp.concatenate(out_r, axis=-1) if c > 1 else out_r[0],
            jnp.concatenate(out_i, axis=-1) if c > 1 else out_i[0])


@functools.lru_cache(maxsize=None)
def _build_rfft(plan: P.FFTParams, tile_t: int, precision: str):
    """Fused R2C kernel: real (rows, n) -> packed revblock spectrum.

    Specialized on the static r2c :class:`FFTParams` plan (n = real length,
    core at n//2 — the reference's half-size template dispatch,
    FFT-GPU-32bit-Stockham.cu:406-427).  The transform itself is
    :func:`emit_rfft`; this wrapper owns the pallas_call plumbing."""
    n = plan.n
    ordered = plan.ordered
    L = n // 2
    assert L // LANES >= 1
    consts = _rfft_tables(n, precision)
    n_c = len(consts)

    def kernel(*refs):
        x_ref = refs[0]
        cs = tuple(r[:] for r in refs[1:1 + n_c])
        or_ref, oi_ref = refs[1 + n_c], refs[2 + n_c]
        o_r, o_i = emit_rfft(x_ref[:], cs, n=n, tile_t=tile_t,
                             precision=precision, ordered=ordered)
        or_ref[:] = o_r
        oi_ref[:] = o_i

    in_spec = pl.BlockSpec((tile_t, n), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_t, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_c

    @jax.jit
    def run(x):
        b = x.shape[0]
        grid = b // tile_t
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[in_spec] + const_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b, L), jnp.float32),
                       jax.ShapeDtypeStruct((b, L), jnp.float32)),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(x, *consts)

    return run


def rfft_fused_planar(x: jnp.ndarray, precision: str = "highest",
                      tile_t: int | None = None, ordered: bool = False):
    """Fused single-pass R2C: real (B, n) fp32 -> packed revblock spectrum
    as planar (B, n/2) pair.  Requires n >= 256."""
    n = x.shape[-1]
    if n < 256 or n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(f"rfft_fused requires real n in "
                         f"{[s for s in P.SUPPORTED_REAL_SIZES if s >= 256]}")
    if (ordered and n <= 2048 and tile_t is None
            and precision in ("highest", "high")):
        # natural-order spectra come from the pencil kernel at full
        # bandwidth for n <= 2048 (every structural op is a free
        # plane-list manipulation there — ops/pencil.py; device-
        # measured 612-640 GB/s); the bf16 precision modes stay on
        # matmul kernels (the pencil ladder is pure fp32 VPU)
        from smfft_tpu.ops import pencil
        return pencil.rfft_pencil_planar(x, n)
    if ordered and n >= 4096 and tile_t is None:
        # n >= 4096: the pair-rows kernel (ops/real_direct.py) — two
        # real rows ride one ordered-c2c front, Hermitian split in the
        # packed-product row domain; 597/586 GB/s at 4096/8192 vs
        # 463/310 for the pencil/digit-swap paths
        # (tools/tune_real_direct.py + /tmp probe, v5e)
        from smfft_tpu.ops import real_direct
        return real_direct.rfft_pair_planar(x, precision=precision)
    precision = _pc.resolve_scheme_real(precision, n)
    rows = x.shape[0]
    pad = (-rows) % 8
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad, n), x.dtype)], axis=0)
    b = x.shape[0]
    # device-profiled best on v5e across 512-8192 (tools, round 2);
    # the ordered digit-swap at c >= 32 blows the Mosaic compile at
    # tile 512 — 128 compiles and measures best there
    tile = tile_t or (128 if (ordered and n >= 8192) else 512)
    while tile > 8 and b % tile:
        tile //= 2
    if b % tile:
        raise ValueError(f"batch {b} not divisible by tile {tile}")
    plan = P.plan_for(n, "forward", "r2c", ordered)
    run = _build_rfft(plan, tile, precision)
    o_r, o_i = run(x.astype(jnp.float32))
    if pad:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i


def rfft_pallas_fused(x: jnp.ndarray, precision: str = "highest",
                      packed: bool = False) -> jnp.ndarray:
    """Fused R2C with natural-order output, entirely in-kernel (pencil
    kernel for n <= 4096, matmul kernel + in-kernel digit swap above —
    no XLA relayout pass); numpy (..., n/2+1) or packed (..., n/2)."""
    n = x.shape[-1]
    batch_shape = x.shape[:-1]
    xb = x.reshape((-1, n))
    o_r, o_i = rfft_fused_planar(xb, precision=precision, ordered=True)
    L = n // 2
    if packed:
        return jax.lax.complex(o_r, o_i).reshape(batch_shape + (L,))
    # assemble the numpy (..., L+1) layout in PLANAR form and convert with
    # ONE lax.complex at the end: an `f32 + 0j` here would lower to an
    # f32->c64 convert_element_type, which the axon TPU backend rejects
    # (UNIMPLEMENTED at readback)
    zero = jnp.zeros_like(o_r[:, :1])
    fr = jnp.concatenate([o_r[:, :1], o_r[:, 1:], o_i[:, :1]], axis=-1)
    fi = jnp.concatenate([zero, o_i[:, 1:], zero], axis=-1)
    return jax.lax.complex(fr, fi).reshape(batch_shape + (L + 1,))


# ---------------------------------------------------------------------------
# Fully-fused C2R kernel (n >= 256): the exact mirror of the fused R2C.
#
# Consumes the packed revblock spectrum (as produced by rfft_fused_planar —
# a relayout-free real-transform roundtrip), reconstructs the half-size
# spectrum Z[k] = A[k] X[k] + B[k] conj(X[(L-k) mod L]) with the mirror's
# lane reversal folded into ROW-permuted inverse-DFT matrices, runs the
# B-style inverse core (lane matmul -> twiddle -> plane ladder), and
# re-interleaves (re, im) -> (even, odd) samples with within-tile gathers.
# Output is the natural real signal scaled by L = n/2 (the reference's
# unnormalized contract, FFT.c:170-171).
# ---------------------------------------------------------------------------


def _irfft_tables(n: int, precision: str = "highest"):
    """Constant tables for the fused c2r kernel.

    The mirror side needs no extra DFT matrices: the row-permuted matmul
    u @ G[perm, :] equals (lane-permuted u) @ G, so the permutation moves
    onto the DATA (one lane flip, plus a roll for the k2=0 plane) and the
    two merge operands share ONE symmetry-packed lane DFT."""
    L = n // 2
    c = L // LANES
    # inverse-direction half-size tables
    _, _, t_re, t_im, _, _ = _tables(L, inverse=True)
    m = _sym_matrix(L, inverse=True)
    # A/B merge tables in revblock layout [k2, k1], k = k1*c + k2:
    # A = (1 + i W^{-k})/2, B = (1 - i W^{-k})/2, W^{-k} = e^{+2pi i k/n}
    k1 = np.arange(LANES, dtype=np.float64)[None, :]
    k2 = np.arange(max(c, 1), dtype=np.float64)[:, None]
    k = k1 * max(c, 1) + k2
    wi_re = np.cos(2.0 * np.pi * k / n)
    wi_im = np.sin(2.0 * np.pi * k / n)
    # iW^{-k} = -wi_im + i wi_re
    a_re, a_im = (1.0 - wi_im) * 0.5, +0.5 * wi_re
    b_re, b_im = (1.0 + wi_im) * 0.5, -0.5 * wi_re
    f32 = lambda a: np.ascontiguousarray(a, np.float32)
    base = [f32(t_re), f32(t_im), m]
    if precision in _SPLIT3:
        base.extend(_np_split_bf16_3(m))
    elif precision in _SPLIT2:
        base.extend(_np_split_bf16(m))
    base.extend(map(f32, (a_re, a_im, b_re, b_im)))
    return tuple(base)


def _interleave(z_re, z_im, rows):
    """(rows, 128) planar pair -> (rows, 256) with re at even lanes, im at
    odd — the inverse of _deinterleave (within-tile gathers + roll)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    even = (lane % 2) == 0
    # first output tile: sources lanes 0..63; second: 64..127
    idx_lo = lane // 2
    idx_hi = 64 + lane // 2
    out0 = jnp.where(even, jnp.take_along_axis(z_re, idx_lo, axis=-1),
                     jnp.take_along_axis(z_im, idx_lo, axis=-1))
    out1 = jnp.where(even, jnp.take_along_axis(z_re, idx_hi, axis=-1),
                     jnp.take_along_axis(z_im, idx_hi, axis=-1))
    return jnp.concatenate([out0, out1], axis=-1)


def emit_irfft(x_r, x_i, cs, *, n: int, tile_t: int,
               precision: str = "highest", in_natural: bool = False):
    """In-kernel C2R emitter, composable from user Pallas kernels (the
    inverse counterpart of :func:`emit_rfft`).

    x_r, x_i: (tile_t, n/2) planar packed spectrum (slot 0 = (DC, Nyq)),
    revblock layout — or natural order with in_natural=True (converted
    in-kernel via digit_swap_split).  cs: the values of
    :func:`_irfft_tables`.  Returns (tile_t, n) natural real rows,
    scaled by n/2 (reference contract, SURVEY.md quirk 3)."""
    L = n // 2
    c = L // LANES
    n_split = n_splits(precision)
    t_re, t_im, m = cs[:3]
    m_splits = cs[3:3 + n_split] or None
    a_re, a_im, b_re, b_im = cs[3 + n_split:]

    if in_natural and c > 1:
        # natural -> revblock conversion in-kernel (no HBM relayout)
        rc = digit_swap_split(x_r, c)
        ic = digit_swap_split(x_i, c)
        xc = list(zip(rc, ic))
    else:
        xc = [ (x_r[:, j*LANES:(j+1)*LANES],
                x_i[:, j*LANES:(j+1)*LANES]) for j in range(c)]
    # term-1 operand: A*X, with slot 0 replaced by the true
    # Z[0] = (DC+Nyq)/2 + i(DC-Nyq)/2  (X[0] packs (DC, Nyq))
    u1_r, u1_i = [], []
    for k2 in range(c):
        ar_, ai_ = a_re[k2, :], a_im[k2, :]
        vr, vi = xc[k2]
        tr = vr * ar_ - vi * ai_
        ti = vr * ai_ + vi * ar_
        if k2 == 0:
            l0 = jax.lax.broadcasted_iota(jnp.int32, tr.shape, 1) == 0
            tr = jnp.where(l0, (vr + vi) * 0.5, tr)
            ti = jnp.where(l0, (vr - vi) * 0.5, ti)
        u1_r.append(tr)
        u1_i.append(ti)

    # term-2 operand: B * perm(conj(X[mirror-plane])), slot 0 zeroed
    # (its contribution is already carried in u1's slot-0 fix).  The
    # row-permuted matmuls of the old formulation moved onto the
    # DATA: u @ G[perm,:] == (lane-permuted u) @ G, so both merge
    # operands share ONE lane DFT below (2 real dots total vs the
    # previous 9).
    flip = flip_lanes
    u2_r, u2_i = [], []
    for k2 in range(c):
        vr, vi = xc[(c - k2) % c]
        pvr, pvi = flip(vr), flip(vi)
        if k2 == 0:
            pvr = pltpu.roll(pvr, 1, axis=1)
            pvi = pltpu.roll(pvi, 1, axis=1)
        pvi = -pvi                          # conj
        br_, bi_ = b_re[k2, :], b_im[k2, :]
        tr = pvr * br_ - pvi * bi_
        ti = pvr * bi_ + pvi * br_
        if k2 == 0:
            l0 = jax.lax.broadcasted_iota(jnp.int32, tr.shape, 1) == 0
            tr = jnp.where(l0, 0.0, tr)
            ti = jnp.where(l0, 0.0, ti)
        u2_r.append(tr)
        u2_i.append(ti)

    # fold both operands and run ONE symmetry-packed lane DFT
    op_r = jnp.concatenate([u1_r[j] + u2_r[j] for j in range(c)],
                           axis=0)
    op_i = jnp.concatenate([u1_i[j] + u2_i[j] for j in range(c)],
                           axis=0)
    s1_r, s1_i = _lane_dft(op_r, op_i, m, m_splits, precision)

    pre, pim = [], []
    for j2 in range(c):
        rr = s1_r[j2 * tile_t:(j2 + 1) * tile_t]
        ii = s1_i[j2 * tile_t:(j2 + 1) * tile_t]
        # inverse twiddle w_L^{+j2*m1}
        if c > 1:
            tr_, ti_ = t_re[j2, :], t_im[j2, :]
            rr, ii = rr * tr_ - ii * ti_, rr * ti_ + ii * tr_
        pre.append(rr)
        pim.append(ii)

    # sublane inverse DFT_C over j2 -> m2
    zr, zi = _plane_dft_list(pre, pim, +1.0)
    # interleave (re, im) -> (even, odd) real samples per chunk
    out = [ _interleave(zr[m2], zi[m2], tile_t) for m2 in range(c)]
    return jnp.concatenate(out, axis=-1) if c > 1 else out[0]


@functools.lru_cache(maxsize=None)
def _build_irfft(plan: P.FFTParams, tile_t: int, precision: str,
                 in_natural: bool = False):
    """Fused C2R kernel: packed spectrum (rows, L) planar -> natural real
    (rows, n), scaled by L.  Specialized on the static c2r
    :class:`FFTParams` plan.  The transform itself is :func:`emit_irfft`;
    this wrapper owns the pallas_call plumbing."""
    n = plan.n
    L = n // 2
    assert L // LANES >= 1
    consts = _irfft_tables(n, precision)
    n_c = len(consts)

    def kernel(*refs):
        xr_ref, xi_ref = refs[0], refs[1]
        cs = tuple(r[:] for r in refs[2:2 + n_c])
        o_ref = refs[2 + n_c]
        o_ref[:] = emit_irfft(xr_ref[:], xi_ref[:], cs, n=n,
                              tile_t=tile_t, precision=precision,
                              in_natural=in_natural)

    in_spec = pl.BlockSpec((tile_t, L), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((tile_t, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * n_c

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        grid = b // tile_t
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",))
        return pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=[in_spec, in_spec] + const_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *consts)

    return run


def irfft_fused_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int,
                       precision: str = "highest",
                       tile_t: int | None = None,
                       in_natural: bool = False):
    """Fused single-pass C2R: packed spectrum planar (B, n/2) pair ->
    natural real (B, n), scaled by n/2 (reference contract).  The packed
    spectrum is consumed in revblock layout by default (pairs with
    rfft_fused_planar for a relayout-free real roundtrip) or in natural
    order with in_natural=True (converted in-kernel, no relayout pass)."""
    if n < 256 or n not in P.SUPPORTED_REAL_SIZES:
        raise ValueError(f"irfft_fused requires real n in "
                         f"{[s for s in P.SUPPORTED_REAL_SIZES if s >= 256]}")
    if (in_natural and n <= 1024 and tile_t is None
            and precision in ("highest", "high")):
        # natural-order packed spectrum -> pencil kernel (see
        # rfft_fused_planar); the bf16 precision modes stay on the
        # matmul kernel with the in-kernel digit_swap_split
        from smfft_tpu.ops import pencil
        return pencil.irfft_pencil_planar(vr, vi, n)
    if in_natural and n >= 2048 and tile_t is None:
        # n >= 2048: the pair-rows kernels (ops/real_direct.py) — two
        # spectra per inverse-c2c pass, lane- or row-domain Hermitian
        # assembly per the _IRFFT_FORM table; 587/578/554 GB/s at
        # 2048/4096/8192 vs 566/429/389 for the pencil/digit-swap
        # paths (tools/tune_real_direct.py, v5e)
        from smfft_tpu.ops import real_direct
        return real_direct.irfft_pair_planar(vr, vi, n,
                                             precision=precision)
    precision = _pc.resolve_scheme_real(precision, n)
    rows = vr.shape[0]
    pad = (-rows) % 8
    if pad:
        zeros = jnp.zeros((pad, n // 2), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    b = vr.shape[0]
    # device-profiled best on v5e across 512-8192 (tools, round 2);
    # see rfft_fused_planar for the n >= 8192 natural-layout tile
    tile = tile_t or (128 if (in_natural and n >= 8192) else 512)
    while tile > 8 and b % tile:
        tile //= 2
    if b % tile:
        raise ValueError(f"batch {b} not divisible by tile {tile}")
    plan = P.plan_for(n, "inverse", "c2r", True)
    run = _build_irfft(plan, tile, precision, in_natural)
    out = run(vr.astype(jnp.float32), vi.astype(jnp.float32))
    return out[:rows] if pad else out
