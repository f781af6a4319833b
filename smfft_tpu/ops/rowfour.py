"""Single-pass in-row four-step FFT: N = 2**14..2**17 at one HBM pass.

The fused row kernels (ops/pallas_c2c.py) cap at N = 16384 and their
chunk ladder turns VPU-bound past 4096 (ordered 16384 measured 469
GB/s, 0.71x of the 656 GB/s chip roofline).  This kernel removes the
deep ladder from the hot path: each transform row is small enough to
hold entirely in VMEM, so the whole four-step decomposition N = N1*N2
runs inside one pallas_call between a single contiguous HBM read and a
single contiguous HBM write — the same 16 B/point traffic as the plain
row kernels:

    read (SB, N) planar fp32 rows                        [contiguous]
    reshape   -> (SB, N1, N2)     lane-split (free: folded into read)
    transpose -> (SB, N2, N1)     batched (free: folded into read)
    emit_fft ordered over N1      rows (SB*N2, N1): MXU lane DFT
    twiddle  W_N^(t2*k1)          exact split tables (see below)
    sublane DFT over N2           batched MXU matmul W2 @ Z — contracts
                                  the SUBLANE dim, so no mid transpose
    reshape   -> (SB, N)          lane-merge: X[k2*N1+k1] = C[k2, k1]
    write (SB, N) planar fp32 rows                       [contiguous]

N2 is kept <= 128 so the second factor is a single (N2, N2) MXU
contraction (device-ablated: materialized mid-kernel transposes cost
~2.3x the whole-kernel budget; the input-side reshape+transpose and the
output lane-merge are free because Mosaic folds them into the block
read/write).  Output is NATURALLY ORDERED — the four-step index map is
the reorder, replacing the reference's reorder-network cost
(SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:54-329).

Twiddle exactness: lane-digit split (cf. ops/fourstep_fused.py) —
W_N^(t2*k1) = F1[t2, k1 // 128] * F2[t2, k1 % 128], both fp64-computed
fp32-rounded host tables of shape (N2, 128); ``scale`` (1/N for
backward-norm inverses) folds into F1 exactly.  The sublane DFT matrix
W2[k2, t2] is fp64-computed, fp32-rounded, applied with the same
split-bf16 schemes as the lane DFT (x3/x4/x5).

Reference anchor: lifts the shared-memory size cap of
SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:656-658 ("Error wrong FFT
length!") the TPU way.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops import pallas_c2c as _pc
from smfft_tpu.ops.fourstep_fused import _twiddle_split_tables

LANES = 128

#: N -> (N1, N2).  N1 is the lane-DFT factor (a supported row size);
#: N2 is the sublane MXU-matmul factor.  N2 must be exactly 128: the
#: in-kernel lane-split reshape (sb, N) -> (sb, N1, N2) needs the minor
#: dim to fill the 128 lanes (N2 = 64 crashes the Mosaic compiler, and
#: N = 8192 is already at-roofline in the plain row kernels anyway).
FACTORS = {
    16384: (128, 128),
    32768: (256, 128),
    65536: (512, 128),
    131072: (1024, 128),
}

#: batch rows per grid step (Mosaic requires the sublane block dim to be
#: a multiple of 8 or the full array dim).
_DEF_SB = {16384: 8, 32768: 8, 65536: 8, 131072: 8}

#: dot_general dims for (SB, K, T) x (SB, T, L) -> (SB, K, L)
_DIMS_B = (((2,), (1,)), ((0,), (0,)))


def _bdot_l(w, z):
    return jax.lax.dot_general(w, z, dimension_numbers=_DIMS_B,
                               precision=jax.lax.Precision.DEFAULT,
                               preferred_element_type=jnp.float32)


def _split_dot_l(w_splits, z, precision):
    """Constant-LHS mirror of pallas_c2c._split_dot: W (pre-split bf16
    constants) contracts the sublane dim of dynamic data z."""
    if precision == "x5":
        wh, wm, wl = w_splits
        zh = z.astype(jnp.bfloat16)
        zm = (z - zh.astype(jnp.float32)).astype(jnp.bfloat16)
        return (_bdot_l(wh, zh)
                + (_bdot_l(wh, zm) + _bdot_l(wm, zh))
                + (_bdot_l(wm, zm) + _bdot_l(wl, zh)))
    if precision == "x4":
        wh, wm, wl = w_splits
        zh, zl = _pc._split_bf16(z)
        return (_bdot_l(wh, zh) + _bdot_l(wh, zl)
                + (_bdot_l(wm, zh) + _bdot_l(wl, zh)))
    wh, wl = w_splits
    zh, zl = _pc._split_bf16(z)
    return _bdot_l(wh, zh) + (_bdot_l(wh, zl) + _bdot_l(wl, zh))


def stage2_consts(n2: int, inverse: bool, precision: str):
    """numpy constant tables for the symmetry-packed sublane DFT.

    [M, J] where M (n2, n2) packs the unique DFT rows — cosine rows
    0..n2/2 then sine rows 1..n2/2-1 (the row-side mirror of the lane
    DFT's column packing, pallas_c2c._sym_matrix) — and J (n2/2, n2/2)
    is the 0/1 mirror permutation (row 0 -> src 0, row m -> src
    n2/2 - m), exact in a single bf16 MXU pass.  Optional bf16 splits of
    M follow for the manual split schemes.  Device-ablated
    (tools/probe_stage2.py): the packed form beats the 4-real-dot dense
    DFT 212->269 GB/s at 2**15 end-to-end (2 packed dots replace 4)."""
    sign = +1.0 if inverse else -1.0
    cr, si = _pc._dftmat(n2, sign)
    half = n2 // 2
    m = np.concatenate([cr[:half + 1], si[1:half]],
                       axis=0).astype(np.float32)
    j = np.zeros((half, half), np.float32)
    j[0, 0] = 1.0
    for r in range(1, half):
        j[r, half - r] = 1.0
    base = [m, j]
    if precision in _pc._SPLIT3:
        base.extend(_pc._np_split_bf16_3(m))
    elif precision in _pc._SPLIT2:
        base.extend(_pc._np_split_bf16(m))
    return tuple(base)


def n_stage2_consts(precision: str) -> int:
    return 2 + _pc.n_splits(precision)


def _sublane_dft(zr, zi, wconsts, sb: int, n2: int, n1: int,
                 precision: str):
    """Symmetry-packed MXU DFT over the sublane dim: (sb*n2, n1) planar
    rows [t2 sublanes, k1 lanes] -> (sb, n2, n1) [k2, k1].

    Two packed dots against M (half the dense complex product's four),
    slice/add mirror reconstruction, and one exact bf16x3 permutation
    matmul for the reversed bottom half (Mosaic has no sublane-reverse
    primitive; the 0/1 matrix J rides the MXU instead)."""
    half = n2 // 2
    m, jm = wconsts[0], wconsts[1]
    m_splits = tuple(wconsts[2:]) or None
    zr = zr.reshape(sb, n2, n1)
    zi = zi.reshape(sb, n2, n1)
    nsp = _pc.n_splits(precision)

    def bcast(x):
        return jnp.broadcast_to(x[None], (sb,) + x.shape)

    if nsp and m_splits is not None:
        ms = tuple(bcast(x) for x in m_splits)
        pr = _split_dot_l(ms, zr, precision)
        pi = _split_dot_l(ms, zi, precision)
    else:
        enum = _pc._PREC.get(precision, jax.lax.Precision.HIGHEST)
        dot = functools.partial(jax.lax.dot_general,
                                dimension_numbers=_DIMS_B, precision=enum,
                                preferred_element_type=jnp.float32)
        mb = bcast(m)
        pr, pi = dot(mb, zr), dot(mb, zi)
    # rows of P: 0..half = C-products, half+1.. = S-products of 1..half-1
    c_r, c_i = pr[:, 1:half], pi[:, 1:half]
    s_r, s_i = pr[:, half + 1:], pi[:, half + 1:]
    top_r, top_i = c_r - s_i, s_r + c_i          # k2 = 1..half-1
    b_r, b_i = c_r + s_i, c_i - s_r              # k2 = half+1.. reversed
    bsrc_r = jnp.concatenate([pr[:, half:half + 1], b_r], axis=1)
    bsrc_i = jnp.concatenate([pi[:, half:half + 1], b_i], axis=1)
    jb = bcast(jm).astype(jnp.bfloat16)
    dotp = functools.partial(jax.lax.dot_general,
                             dimension_numbers=_DIMS_B,
                             preferred_element_type=jnp.float32)

    def permdot(x):
        # lossless bf16x3 split through the exact 0/1 permutation
        h = x.astype(jnp.bfloat16)
        r1 = x - h.astype(jnp.float32)
        mm = r1.astype(jnp.bfloat16)
        lo = (r1 - mm.astype(jnp.float32)).astype(jnp.bfloat16)
        return dotp(jb, h) + dotp(jb, mm) + dotp(jb, lo)
    out_r = jnp.concatenate([pr[:, 0:1], top_r, permdot(bsrc_r)], axis=1)
    out_i = jnp.concatenate([pi[:, 0:1], top_i, permdot(bsrc_i)], axis=1)
    return out_r, out_i


def _apply_twiddle_b(zr, zi, f1r, f1i, f2r, f2i, sb: int, n2: int,
                     n1: int):
    """Multiply (sb*n2, n1) rows by W_N^((row % n2) * k1) using the
    (n2, 128) split tables: lane chunk a gets (F1[:, a] broadcast) * F2
    — tables tiled over the sb batch rows."""
    if sb > 1:
        f1r, f1i = jnp.tile(f1r, (sb, 1)), jnp.tile(f1i, (sb, 1))
        f2r, f2i = jnp.tile(f2r, (sb, 1)), jnp.tile(f2i, (sb, 1))
    c1 = n1 // LANES
    out_r, out_i = [], []
    for a in range(c1):
        cr = zr[:, a * LANES:(a + 1) * LANES]
        ci = zi[:, a * LANES:(a + 1) * LANES]
        ar, ai = f1r[:, a:a + 1], f1i[:, a:a + 1]
        gr = ar * f2r - ai * f2i
        gi = ar * f2i + ai * f2r
        out_r.append(cr * gr - ci * gi)
        out_i.append(cr * gi + ci * gr)
    return (jnp.concatenate(out_r, axis=-1) if c1 > 1 else out_r[0],
            jnp.concatenate(out_i, axis=-1) if c1 > 1 else out_i[0])


def _rowfour_body(ar, ai, consts1, wconsts, tw, *, n: int, n1: int,
                  n2: int, sb: int, inverse: bool, prec1: str,
                  prec2: str):
    """(sb, n) natural planar rows -> (sb, n) ordered FFT, all in VMEM."""
    f1r, f1i, f2r, f2i = tw
    # A[t1, t2] columns -> lane rows: (sb, n1, n2) -> (sb*n2, n1).
    # Mosaic folds this reshape+transpose into the block read (measured
    # free at 656 GB/s).
    xr = jnp.transpose(ar.reshape(sb, n1, n2), (0, 2, 1)).reshape(-1, n1)
    xi = jnp.transpose(ai.reshape(sb, n1, n2), (0, 2, 1)).reshape(-1, n1)
    zr, zi = _pc.emit_fft(xr, xi, consts1, n=n1, inverse=inverse,
                          precision=prec1, ordered=True)
    zr, zi = _apply_twiddle_b(zr, zi, f1r, f1i, f2r, f2i, sb, n2, n1)
    # FFT over t2 = the sublane dim: batched MXU contraction, then the
    # (k2, k1) result lane-merges straight into X[k2*n1 + k1].
    cr, ci = _sublane_dft(zr, zi, wconsts, sb, n2, n1, prec2)
    return cr.reshape(sb, n), ci.reshape(sb, n)


@functools.lru_cache(maxsize=None)
def _build(n: int, n1: int, n2: int, sb: int, inverse: bool,
           precision: str, scale: float, multiple_iters: int = 0):
    """Jitted (B, n) planar single-pass four-step; grid (B // sb,)."""
    from smfft_tpu.config import debug_print
    debug_print(f"build rowfour: n={n} {n1}x{n2} sb={sb} "
                f"inverse={inverse} precision={precision} "
                f"reuse={multiple_iters}")
    prec1 = _pc.resolve_scheme(precision, n1)
    prec2 = _pc.resolve_scheme(precision, n2)
    nc1 = _pc.n_consts(n1, prec1)
    nc2 = n_stage2_consts(prec2)

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts1 = _pc.read_consts(refs[2:2 + nc1])
        wconsts = tuple(r[:] for r in refs[2 + nc1:2 + nc1 + nc2])
        tw = tuple(r[:] for r in refs[2 + nc1 + nc2:2 + nc1 + nc2 + 4])
        o_r, o_i = refs[2 + nc1 + nc2 + 4:]
        ar, ai = x_r[:], x_i[:]
        body = functools.partial(
            _rowfour_body, consts1=consts1, wconsts=wconsts, tw=tw,
            n=n, n1=n1, n2=n2, sb=sb, inverse=inverse, prec1=prec1,
            prec2=prec2)
        if multiple_iters:
            # NREUSES-style in-VMEM re-application (the reference's
            # _multiple benchmark, FFT-GPU-32bit.cu:666-752)
            def step(_, carry):
                return body(*carry)
            ar, ai = jax.lax.fori_loop(0, multiple_iters, step, (ar, ai))
            o_r[:], o_i[:] = ar, ai
        else:
            o_r[:], o_i[:] = body(ar, ai)

    spec = pl.BlockSpec((sb, n), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2 + 4)
    consts = (_pc.const_arrays(n1, inverse, prec1)
              + stage2_consts(n2, inverse, prec2))
    tw_np = _twiddle_split_tables(n, n1, n2, inverse, scale)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        iters = max(1, multiple_iters)
        cost = pl.CostEstimate(
            flops=int(6 * n * np.log2(n) * b * iters),
            bytes_accessed=b * n * 4 * 4, transcendentals=0)
        compiler_params = None
        if not _pc._INTERPRET:
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary",))
        return pl.pallas_call(
            kernel, grid=(b // sb,),
            in_specs=[spec, spec] + const_specs,
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=compiler_params,
            interpret=_pc._INTERPRET,
        )(vr, vi, *consts, *(jnp.asarray(t) for t in tw_np))
    return run


def pick_sb(n: int, b: int) -> int:
    """Sublane block: full batch when b < 8, else a multiple of 8 (the
    wrapper zero-pads b up to a multiple of the block)."""
    if b < 8:
        return b
    return _DEF_SB.get(n, 8)


def fft_rowfour_planar(vr: jnp.ndarray, vi: jnp.ndarray, *,
                       inverse: bool = False, precision: str = "highest",
                       scale: float = 1.0, multiple_iters: int = 0,
                       sb: int | None = None):
    """Single-pass four-step C2C FFT over the last axis, planar fp32
    in/out, natural order, unnormalized (``scale`` — a power of two —
    folds exactly into the twiddle tables).  Batched over leading axes.

    Supported N: keys of :data:`FACTORS` (2**14..2**17)."""
    n = vr.shape[-1]
    if vr.shape != vi.shape:
        raise ValueError(
            f"planar pair shapes differ: {vr.shape} vs {vi.shape}")
    if n not in FACTORS:
        raise ValueError(
            f"Error wrong FFT length! N={n}; rowfour supports "
            f"{sorted(FACTORS)}")
    n1, n2 = FACTORS[n]
    batch = vr.shape[:-1]
    vr = jnp.asarray(vr, jnp.float32).reshape(-1, n)
    vi = jnp.asarray(vi, jnp.float32).reshape(-1, n)
    b = vr.shape[0]
    sb = sb or pick_sb(n, b)
    pad = (-b) % sb
    if pad:
        vr = jnp.concatenate([vr, jnp.zeros((pad, n), jnp.float32)])
        vi = jnp.concatenate([vi, jnp.zeros((pad, n), jnp.float32)])
    o_r, o_i = _build(n, n1, n2, sb, inverse, precision, scale,
                      multiple_iters)(vr, vi)
    if pad:
        o_r, o_i = o_r[:b], o_i[:b]
    return o_r.reshape(batch + (n,)), o_i.reshape(batch + (n,))
