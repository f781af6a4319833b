"""Fused VMEM-resident batched C2C FFT Pallas kernels — the product core.

TPU-native re-design of the reference's shared-memory device FFT
(do_SMFFT_CT_DIT, SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:334-532;
do_FFT_Stockham_mk6, SMFFT_Stockham_C2C/FFT-GPU-32bit-Stockham.cu:97-240):
one HBM read + one HBM write per transform, all butterfly work in VMEM.

Algorithm: two-factor decimation split N = C * 128 with the 128-point part
contracted on the LANE axis by a dense 128x128 DFT matmul — the MXU is the
TPU's lane-mixing network, replacing the reference's warp shuffles — and
the C-point part contracted on the sublane/register axis by a small matmul.
Complex arithmetic is planar fp32 (Mosaic has no complex dtype) using the
3-multiply (Karatsuba) complex matmul.

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

Natural-order output for N >= 256 ("ordered") is kernel A with the
revblock -> natural relayout done *in-kernel* (emit_fft ordered=True) —
the four-step algorithm's digit-swap absorbed before the single HBM
store, the analogue of the reference's in-kernel reorder network
(FFT-GPU-32bit.cu:54-329, README.md:33-36).  For N <= 128 every transform
fits in one lane row (128/N packed per row for N < 128, mirroring the
reference's 4x32 / 2x64 per-block packing, FFT-GPU-32bit.cu:588-595) and
output is natural for free.
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


def const_arrays(n: int, inverse: bool, precision: str = "highest"):
    """Constant tables (numpy, so they stay trace-time constants and are
    safe to close over in cached builders): the (C, 128) main twiddle and
    the lane DFT matrices (with g_sum = g_re + g_im precomputed for the
    3-mult complex matmul).  Plane-DFT twiddles are python scalars baked
    into the kernel body.  For precision="high" the lane matrices are
    additionally passed as pre-split bf16 (hi, lo) pairs."""
    _, _, t_re, t_im, g_re, g_im = _tables(n, inverse)
    base = [t_re, t_im, g_re, g_im, g_re + g_im]
    if precision == "high":
        for m in (g_re, g_im, g_re + g_im):
            base.extend(_np_split_bf16(m))
    return tuple(base)


def n_consts(n: int, precision: str = "highest") -> int:
    return 11 if precision == "high" else 5


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


def _dot_x3(x, w_pair, dims):
    """3-pass bf16 dot (x_hi*w_hi + x_hi*w_lo + x_lo*w_hi, fp32 accum)
    with the constant side pre-split — the manual lax.Precision.HIGH
    (Mosaic rejects the enum) at ~2x the throughput of "highest"."""
    wh, wl = w_pair
    xh, xl = _split_bf16(x)
    dot = lambda a, b: jax.lax.dot_general(
        a, b, dimension_numbers=dims,
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)
    return dot(xh, wh) + (dot(xh, wl) + dot(xl, wh))


def _cdot(ar, ai, br, bi, bs, dims, precision, split_consts=None):
    """3-mult complex dot_general of planar (ar, ai) with planar constant
    (br, bi); bs = br + bi.  For precision="high", split_consts carries
    the pre-split bf16 (hi, lo) pairs of (br, bi, bs)."""
    if precision == "high" and split_consts is not None:
        t1 = _dot_x3(ar, split_consts[0], dims)
        t2 = _dot_x3(ai, split_consts[1], dims)
        t3 = _dot_x3(ar + ai, split_consts[2], dims)
        return t1 - t2, t3 - t1 - t2
    dot = lambda x, w: jax.lax.dot_general(
        x, w, dimension_numbers=dims, precision=_PREC[precision],
        preferred_element_type=jnp.float32)
    t1 = dot(ar, br)
    t2 = dot(ai, bi)
    t3 = dot(ar + ai, bs)
    return t1 - t2, t3 - t1 - t2


def _cmul_scalar(re, im, wr: float, wi: float):
    """(re + i*im) * (wr + i*wi) with python-scalar twiddles; exact
    special cases for 1, -1, +-i avoid needless VPU multiplies (the same
    trick as the reference's fused +-i*W last stage,
    FFT-GPU-32bit.cu:492-531)."""
    if wi == 0.0:
        if wr == 1.0:
            return re, im
        if wr == -1.0:
            return -re, -im
        return re * wr, im * wr
    if wr == 0.0:
        if wi == 1.0:
            return -im, re
        if wi == -1.0:
            return im, -re
        return -im * wi, re * wi
    return re * wr - im * wi, re * wi + im * wr


def _w_scalar(sign: float, k: int, c: int):
    ang = sign * 2.0 * math.pi * k / c
    wr, wi = math.cos(ang), math.sin(ang)
    for exact in (0.0, 1.0, -1.0):  # snap so _cmul_scalar special-cases hit
        if abs(wr - exact) < 1e-12:
            wr = exact
        if abs(wi - exact) < 1e-12:
            wi = exact
    return wr, wi


def _plane_dft_list(pre, pim, sign: float):
    """Recursive radix-4 (radix-2 fallback) DIT DFT over a python list of
    (T, 128) planes.

    Plane extraction/recombination is a leading-dim operation — no
    lane/sublane relayout — so the C-point sublane transform costs a few
    VPU flops/point/level with python-scalar twiddles.  Radix-4 halves the
    number of levels (and therefore intermediate-value traffic) vs radix-2.
    This replaces both the reference's padded-shared-memory exchange stages
    (FFT-GPU-32bit.cu:456-490) and a Mosaic-hostile tiny matmul.
    """
    c = len(pre)
    if c == 1:
        return pre, pim
    if c % 4 == 0:
        sub = [_plane_dft_list(pre[j::4], pim[j::4], sign) for j in range(4)]
        q = c // 4
        out_r = [None] * c
        out_i = [None] * c
        for k in range(q):
            # twiddled sub-transform outputs t_j = w_c^{j*k} * X_j[k]
            t = [ _cmul_scalar(sub[j][0][k], sub[j][1][k],
                               *_w_scalar(sign, j * k, c)) for j in range(4)]
            # radix-4 butterfly; +-i depends on direction
            a0r, a0i = t[0][0] + t[2][0], t[0][1] + t[2][1]
            a1r, a1i = t[0][0] - t[2][0], t[0][1] - t[2][1]
            a2r, a2i = t[1][0] + t[3][0], t[1][1] + t[3][1]
            a3r, a3i = t[1][0] - t[3][0], t[1][1] - t[3][1]
            # j3 = sign * i * a3  (multiply by -i for forward sign=-1)
            j3r, j3i = (-a3i, a3r) if sign > 0 else (a3i, -a3r)
            out_r[k],          out_i[k]          = a0r + a2r, a0i + a2i
            out_r[k + q],      out_i[k + q]      = a1r + j3r, a1i + j3i
            out_r[k + 2 * q],  out_i[k + 2 * q]  = a0r - a2r, a0i - a2i
            out_r[k + 3 * q],  out_i[k + 3 * q]  = a1r - j3r, a1i - j3i
        return out_r, out_i
    er, ei = _plane_dft_list(pre[0::2], pim[0::2], sign)
    orr, oi = _plane_dft_list(pre[1::2], pim[1::2], sign)
    out_r = [None] * c
    out_i = [None] * c
    for k in range(c // 2):
        tr, ti = _cmul_scalar(orr[k], oi[k], *_w_scalar(sign, k, c))
        out_r[k], out_i[k] = er[k] + tr, ei[k] + ti
        out_r[k + c // 2], out_i[k + c // 2] = er[k] - tr, ei[k] - ti
    return out_r, out_i


def _chunks(x, c):
    """Static lane-chunk list view of a (T, c*128) value — tile-granular
    slices, zero relayout (Mosaic supports neither lane-splitting reshapes
    nor cheap rank-3 views of wide rows)."""
    return [x[:, j * LANES:(j + 1) * LANES] for j in range(c)]


def _cat_lanes(chunks):
    return jnp.concatenate(chunks, axis=-1) if len(chunks) > 1 else chunks[0]


def _riffle(a, b):
    """Elementwise interleave of two equal-width streams: out[2k] = a[k],
    out[2k+1] = b[k].  Width must be a multiple of 128; every gather stays
    within one 128-lane tile (cross-tile gathers are unsupported)."""
    t_rows, m = a.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (t_rows, LANES), 1)
    even = (lane % 2) == 0
    idx_lo = lane // 2
    idx_hi = 64 + lane // 2
    out = []
    for t in range(m // LANES):
        at = a[:, t * LANES:(t + 1) * LANES]
        bt = b[:, t * LANES:(t + 1) * LANES]
        out.append(jnp.where(even, jnp.take_along_axis(at, idx_lo, axis=-1),
                             jnp.take_along_axis(bt, idx_lo, axis=-1)))
        out.append(jnp.where(even, jnp.take_along_axis(at, idx_hi, axis=-1),
                             jnp.take_along_axis(bt, idx_hi, axis=-1)))
    return jnp.concatenate(out, axis=-1)


def _riffle_merge(streams):
    """Merge c equal-width streams into their cyclic element interleave:
    out[i] = streams[i % c][i // c] — the revblock -> natural relayout
    (out[k1*c+k2] = chunk k2 at lane k1) done with VPU shuffles in
    ~3*log2(c) ops/point, replacing a 3.5x-slower XLA transpose epilogue.
    This is the TPU analogue of the reference's in-kernel bit-reversal
    reorder (FFT-GPU-32bit.cu:54-329)."""
    streams = list(streams)
    while len(streams) > 1:
        half = len(streams) // 2
        streams = [_riffle(streams[i], streams[i + half])
                   for i in range(half)]
    return streams[0]


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
    t_re, t_im, g_re, g_im, g_sum = consts[:5]
    split_consts = (tuple((consts[5 + 2 * i], consts[6 + 2 * i])
                          for i in range(3)) if len(consts) > 5 else None)
    tile_t = xr.shape[0]
    c = max(1, n // LANES)
    sign = +1.0 if inverse else -1.0
    dims2 = (((1,), (0,)), ((), ()))

    if _ABLATE == "copy_only":
        return xr, xi
    if c == 1:
        # single-chunk transforms are natural-ordered already
        o_re, o_im = _cdot(xr, xi, g_re, g_im, g_sum, dims2, precision,
                           split_consts)
        return o_re, o_im

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
    # fold chunks into rows (k2-major) for one full-width lane matmul
    a_re = jnp.concatenate(pre, axis=0)
    a_im = jnp.concatenate(pim, axis=0)
    if _ABLATE == "no_matmul":
        o_re, o_im = a_re, a_im
    else:
        # lane DFT_128: (c*T, n1) x G (n1, k1) -> (c*T, k1)
        o_re, o_im = _cdot(a_re, a_im, g_re, g_im, g_sum, dims2, precision,
                           split_consts)
    # rows back to lane chunks: chunk k2 = rows [k2*T, (k2+1)*T)
    out_r = [o_re[k2 * tile_t:(k2 + 1) * tile_t, :] for k2 in range(c)]
    out_i = [o_im[k2 * tile_t:(k2 + 1) * tile_t, :] for k2 in range(c)]
    if ordered:
        # natural order in-kernel: out[k1*c + k2] = chunk[k2][k1]
        return _riffle_merge(out_r), _riffle_merge(out_i)
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
    t_re, t_im, g_re, g_im, g_sum = consts[:5]
    split_consts = (tuple((consts[5 + 2 * i], consts[6 + 2 * i])
                          for i in range(3)) if len(consts) > 5 else None)
    tile_t = xr.shape[0]
    c = max(1, n // LANES)
    sign = +1.0 if inverse else -1.0
    dims2 = (((1,), (0,)), ((), ()))

    if c == 1:
        return _cdot(xr, xi, g_re, g_im, g_sum, dims2, precision,
                     split_consts)

    # lane DFT first: contract j1 -> m1 on all chunks folded into rows
    a_re = jnp.concatenate(_chunks(xr, c), axis=0)
    a_im = jnp.concatenate(_chunks(xi, c), axis=0)
    s_re, s_im = _cdot(a_re, a_im, g_re, g_im, g_sum, dims2, precision,
                       split_consts)
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


# Per-size batch tiles, tuned on v5e with 2 GB single-dispatch
# differencing (see .claude/skills/verify).  Larger tiles amortize
# per-grid-step overhead until the kernel's VMEM frame OOMs the
# scoped budget.
_TUNED_TILES = {32: 1024, 64: 4096, 128: 4096, 256: 2048, 512: 256,
                1024: 256, 2048: 64, 4096: 128}


def default_tile(n: int) -> int:
    """Batch-tile rows per grid step (tuned per size on v5e)."""
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
            xr = xr * s
            xi = xi * s
        if multiple_iters:
            scale = np.float32(1.0 / math.sqrt(float(n)))

            def body(_, carry):
                r, i = carry
                o_r, o_i = emit(r, i, consts, n=n, inverse=inverse,
                                precision=precision)
                return o_r * scale, o_i * scale
            xr, xi = jax.lax.fori_loop(0, multiple_iters, body, (xr, xi))
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
            compiler_params = pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
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


def _pick_tile(b: int, n: int, tile_t: int | None) -> int:
    tile = tile_t or default_tile(n)
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
    vr, vi, rows = _pad_rows(vr, vi)
    tile = _pick_tile(vr.shape[0], n, tile_t)
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
