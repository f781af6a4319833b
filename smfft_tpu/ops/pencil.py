"""Pencil-layout kernels: the in-VMEM reuse path, the ordered external
path for small N, and the fused real transforms.

The pencil form relayouts a (1024, n) block of row-FFTs ONCE into
``big (8n, 128)`` where plane j = rows [8j, 8j+8) holds sample j of
8*128 = 1024 independent FFTs.  In that layout the whole transform is
the pure-VPU radix-4 plane ladder (:func:`pallas_c2c._plane_dft_list`)
over sublane planes with python-scalar twiddles — no MXU, no lane
gathers — and every structural operation the matmul-DFT kernels pay
VPU relayouts for becomes a FREE python-level plane-list manipulation:

  * natural-order output: the DIT recursion returns frequency-indexed
    planes — no digit-swap relayout at all;
  * even/odd deinterleave (r2c): plane list [0::2] / [1::2];
  * the Hermitian mirror Z[(L-k) mod L] (r2c/c2r): a plane permutation;
  * the (DC, Nyquist) packed slot: plane 0 special-cased statically,
    no iota/mask selects;
  * re-interleaving real samples (c2r): alternating the plane list.

Three products ride this:

1. ``multiple_pencil_planar`` — the NREUSES/multiple fast path.  The
   reference's signature result is its ``_multiple`` benchmark running
   1.5-5x faster than the HBM-bound external path by re-applying the
   core to shared-memory-resident data (FFT-GPU-32bit.cu:553-572,
   README.md:84-91); the matmul-DFT in-VMEM loop is MXU-bound at
   ~external parity (BENCH_DETAILS "multiple_ablation"), but the pencil
   ladder re-applies with no per-iteration relayout — radix-8 levels,
   plane-list fori_loop carry at small n (no per-iteration
   concat/re-slice), 2x-unrolled body, and the 1/sqrt(n) bounding
   scale folded into the top-level twiddles.  Round-3 v5e: reuse
   ratios 5.2/4.8/4.6/3.9/…/1.7x external across N = 32..4096 (the
   reference's own curve: 5.1/4.1/3.0/2.6/2.3/2.1/1.8/1.6x — at or
   above it at every size); 6675 MFFT/s at N = 32, 104 at N = 1024,
   16.6 at N = 4096 (512-row blocks).
2. ``fft_pencil_planar`` — single-pass natural-order C2C for
   N = 256/512, full HBM roofline (658/656 GB/s) where the matmul
   ordered merge pays sub-sublane-granule slices.
3. ``rfft_pencil_planar`` / ``irfft_pencil_planar`` — fused R2C/C2R
   (SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344 parity:
   half-size complex core + split/merge with W(N, k), packed
   (DC, Nyquist) slot 0, unnormalized L-scaled inverse) with
   natural-order spectra and zero gather/relayout cost; the product
   natural-order path for r2c N <= 2048 and c2r N <= 4096 (the
   pair-rows kernel, ops/real_direct.py, takes r2c above that).
4. ``multiple_real_pencil_planar`` — the REAL-transform reuse loop
   (rfft -> irfft pairs on VMEM-resident pencils, the R2C
   FFT_multiple_benchmark analogue): 434/200/92/38 MFFT/s at
   N = 512..4096 on v5e, 2.3-2.8x the external real rate.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops import pallas_c2c as _pc
from smfft_tpu.ops.pallas_c2c import _plane_dft_list

R_BLOCK = 1024  # FFTs per grid block: 8 slabs x 128 lanes
# n = 4096 runs 512-row blocks (4 slabs): the (1024, 4096) double-
# buffered pipeline needs 187 MB of VMEM against the chip's 128
_R_BLOCK_4096 = 512


def _r_block(n: int) -> int:
    return _R_BLOCK_4096 if n >= 4096 else R_BLOCK


def _pick_slabs(n: int, rows: int) -> int:
    """Slabs (128-row groups) per pencil block: the full pipeline depth
    for large batches, fewer for small ones so an 8-row call does not pay
    up to 128x redundant padded compute (ADVICE r2)."""
    max_slabs = _r_block(n) // 128
    return min(max_slabs, max(1, -(-rows // 128)))


def _check_n(n: int, lo: int = 32, hi: int = 4096) -> None:
    """Pencil ladder size gate: power-of-two within [lo, hi] (the same
    'wrong FFT length' contract as the api layer; ADVICE r2 — a
    non-power-of-two used to die deep in the plane ladder)."""
    if not lo <= n <= hi or n & (n - 1):
        raise ValueError(
            f"Error wrong FFT length! pencil path supports power-of-two "
            f"{lo} <= n <= {hi}, got {n}")


def _to_pencil(x, n, slabs: int = 8):
    """(slabs*128, n) rows -> pencil (slabs*n, 128): plane j = rows
    [slabs*j, slabs*(j+1)) holds sample j of the slabs*128 FFTs
    (slab transposes + one sublane interleave)."""
    sl = [jnp.transpose(x[r * 128:(r + 1) * 128, :]) for r in range(slabs)]
    return jnp.stack(sl, axis=1).reshape(slabs * n, 128)


def _from_pencil(b, n, slabs: int = 8):
    """Inverse of :func:`_to_pencil`: pencil (slabs*n, 128) ->
    (slabs*128, n)."""
    b3 = b.reshape(n, slabs, 128)
    return jnp.concatenate(
        [jnp.transpose(b3[:, r, :]) for r in range(slabs)], axis=0)


def _planes(b, n, slabs: int = 8):
    """Pencil (slabs*n, 128) -> python list of n (slabs, 128) planes."""
    return [b[slabs * j:slabs * (j + 1)] for j in range(n)]


# Public emitter surface — the pencil-domain analogue of the reference's
# __device__-callable core (README.md:10: "expected to be called within
# a GPU kernel").  A user Pallas kernel composes them directly:
#
#     big_r, big_i = to_pencil(xr, n), to_pencil(xi, n)
#     fr, fi = plane_fft(planes(big_r, n), planes(big_i, n))   # forward
#     ... elementwise frequency-domain work on the plane lists ...
#     br, bi = plane_fft(fr2, fi2, inverse=True)               # inverse
#     out_r = from_pencil(jnp.concatenate(br, axis=0), n)
#
# Plane k of the forward output is frequency k (natural order), so
# per-frequency filters are python-indexed plane operations — no masks,
# no gathers.  See tpu_smoke.py for a compiled FFT -> filter -> IFFT
# convolution kernel built this way.
to_pencil = _to_pencil
from_pencil = _from_pencil
planes = _planes


def plane_fft(planes_r, planes_i, inverse: bool = False):
    """DFT over a python list of pencil planes (any (rows, 128) shape).

    Forward is the unnormalized DFT, inverse the unnormalized inverse
    (scale by 1/len(planes) for numpy ``ifft`` semantics).  Output plane
    k is frequency k — natural order by construction."""
    return _plane_dft_list(list(planes_r), list(planes_i),
                           +1.0 if inverse else -1.0)


# Below this n the reuse loop carries the PLANE LISTS through fori_loop
# directly (a pytree of n small (slabs, 128) buffers) instead of
# re-concatenating and re-slicing the big pencil buffer every iteration
# — the per-iteration relayout was the dominant fixed overhead at the
# reference's headline small sizes (VERDICT r2 next #2).  Large n keeps
# the two-big-buffer carry (thousands of tiny loop-carried buffers blow
# up compile time).
_PLANE_CARRY_MAX = 256


def _pencil_block(xr, xi, n: int, iters: int, sign: float,
                  per_iter_scale: bool = True, slabs: int = 8):
    """The per-(slabs*128, n)-block transform body — pure jnp, shared by
    the Pallas kernel and the compiled CPU fallback (the interpreter is
    far too slow for the unrolled n-plane ladder).

    per_iter_scale multiplies 1/sqrt(n) into each application (keeps the
    100x reuse loop bounded), folded into the ladder's top-level twiddles
    (near-free; see _plane_dft_list); the single-pass external path turns
    it off for raw unnormalized FFT semantics."""
    scale = float(1.0 / np.sqrt(float(n))) if per_iter_scale else None

    br = _to_pencil(xr, n, slabs)
    bi = _to_pencil(xi, n, slabs)

    if iters == 1:
        o_r, o_i = _plane_dft_list(_planes(br, n, slabs),
                                   _planes(bi, n, slabs), sign, scale)
        return (_from_pencil(jnp.concatenate(o_r, axis=0), n, slabs),
                _from_pencil(jnp.concatenate(o_i, axis=0), n, slabs))

    if n <= _PLANE_CARRY_MAX:
        # plane-list carry, 2 applications per loop step (halves loop
        # bookkeeping; the odd iteration peels off after the loop)
        pr = tuple(_planes(br, n, slabs))
        pi = tuple(_planes(bi, n, slabs))

        def one(pr, pi):
            o_r, o_i = _plane_dft_list(list(pr), list(pi), sign, scale)
            return tuple(o_r), tuple(o_i)

        def body(_, carry):
            cr, ci = one(*carry)
            return one(cr, ci)

        pr, pi = jax.lax.fori_loop(0, iters // 2, body, (pr, pi))
        if iters % 2:
            pr, pi = one(pr, pi)
        return (_from_pencil(jnp.concatenate(pr, axis=0), n, slabs),
                _from_pencil(jnp.concatenate(pi, axis=0), n, slabs))

    def body(_, carry):
        cr, ci = carry
        o_r, o_i = _plane_dft_list(_planes(cr, n, slabs),
                                   _planes(ci, n, slabs), sign, scale)
        return (jnp.concatenate(o_r, axis=0),
                jnp.concatenate(o_i, axis=0))
    br, bi = jax.lax.fori_loop(0, iters, body, (br, bi))
    return _from_pencil(br, n, slabs), _from_pencil(bi, n, slabs)


@functools.lru_cache(maxsize=None)
def _build(n: int, iters: int, inverse: bool, interpret: bool = False,
           per_iter_scale: bool = True, fused_scale: bool = False,
           slabs: int | None = None):
    sign = +1.0 if inverse else -1.0

    slabs = slabs or _r_block(n) // 128
    rb = slabs * 128

    if interpret:
        # eager per-block loop on the host platform: the Pallas
        # interpreter is hours-slow on the unrolled ladder and XLA:CPU
        # compile of the ~n*log(n)-op graph takes minutes under the
        # 8-virtual-device test config, while eager runs it in ~1 s
        def run_host(vr, vi, scale=None):
            with jax.disable_jit():
                if fused_scale:
                    vr = vr * scale
                    vi = vi * scale
                outs = [_pencil_block(vr[s:s + rb],
                                      vi[s:s + rb], n, iters, sign,
                                      per_iter_scale, slabs)
                        for s in range(0, vr.shape[0], rb)]
                return (jnp.concatenate([o[0] for o in outs], axis=0),
                        jnp.concatenate([o[1] for o in outs], axis=0))
        return run_host

    def kernel(*refs):
        if fused_scale:
            xr_ref, xi_ref, s_ref, our_ref, oui_ref = refs
            s = s_ref[0]
            xr, xi = xr_ref[:] * s, xi_ref[:] * s
        else:
            xr_ref, xi_ref, our_ref, oui_ref = refs
            xr, xi = xr_ref[:], xi_ref[:]
        o_r, o_i = _pencil_block(xr, xi, n, iters, sign, per_iter_scale,
                                 slabs)
        our_ref[:] = o_r
        oui_ref[:] = o_i

    spec = pl.BlockSpec((rb, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    scale_specs = ([pl.BlockSpec(memory_space=pltpu.SMEM)] if fused_scale
                   else [])

    # the 4096-plane ladder's live intermediates need ~119 MB of scoped
    # VMEM even at 512-row blocks; 120 fits (the chip has 128 physical)
    vmem_mb = 120 if n >= 4096 else 110

    @jax.jit
    def run(vr, vi, scale=None):
        b = vr.shape[0]
        extra = (scale.reshape(1),) if fused_scale else ()
        return pl.pallas_call(
            kernel, grid=(b // rb,),
            in_specs=[spec, spec] + scale_specs, out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
        )(vr, vi, *extra)
    return run


def multiple_pencil_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int,
                           iters: int, inverse: bool = False):
    """``iters`` in-VMEM FFT re-applications in pencil layout.

    vr/vi: planar fp32 (B, n), one FFT per row — note n < 128 rows here
    are NOT lane-packed (unlike fft_planar): the pencil transposes rows
    into planes, so each row is one transform at any width.  B is
    padded internally to the block row count.  Returns the planar pair
    after ``iters`` applications, each natural-order and scaled by
    1/sqrt(n).  Supported for 32 <= n <= 4096 (4096 runs 512-row
    blocks for VMEM; see _r_block).
    """
    _check_n(n)
    if vr.shape[-1] != n:
        raise ValueError(f"expected row width {n}, got {vr.shape[-1]}")
    rows = vr.shape[0]
    slabs = _pick_slabs(n, rows)
    pad = (-rows) % (slabs * 128)
    if pad:
        zeros = jnp.zeros((pad, n), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    o_r, o_i = _build(n, iters, inverse, _pc._INTERPRET,
                      slabs=slabs)(vr, vi)
    if pad:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i


def _rfft_planes(pl_, n: int):
    """Plane-level R2C core: n real sample planes -> (out_r, out_i)
    packed-spectrum plane lists of length L = n/2, slot 0 = (DC, Nyq).

    Reference math parity (FFT-GPU-32bit-Stockham.cu:269-340): half-size
    complex FFT of (even + i*odd), then X[k] = P Z[k] + Q conj(Z[L-k])
    with P = (1 - iW^k)/2, Q = (1 + iW^k)/2, W = e^{-2pi i/n}.  In
    pencil form the deinterleave is plane-list slicing, the mirror is a
    plane permutation, and P/Q are python-scalar constants per plane."""
    L = n // 2
    zr, zi = _plane_dft_list(pl_[0::2], pl_[1::2], -1.0)
    out_r, out_i = [None] * L, [None] * L
    out_r[0] = zr[0] + zi[0]            # DC
    out_i[0] = zr[0] - zi[0]            # Nyquist (packed slot)
    for k in range(1, L):
        m = L - k
        th = -2.0 * math.pi * k / n
        sn, cs = math.sin(th), math.cos(th)
        p_re, p_im = (1.0 + sn) * 0.5, -0.5 * cs
        q_re, q_im = (1.0 - sn) * 0.5, +0.5 * cs
        if k == L // 2:                 # th = -pi/2: P = 0, Q = 1
            out_r[k], out_i[k] = zr[m], -zi[m]
            continue
        out_r[k] = (zr[k] * p_re - zi[k] * p_im
                    + zr[m] * q_re + zi[m] * q_im)
        out_i[k] = (zr[k] * p_im + zi[k] * p_re
                    + zr[m] * q_im - zi[m] * q_re)
    return out_r, out_i


def _rfft_block(x, n: int, slabs: int = 8):
    """Fused R2C on one (slabs*128, n) real block -> natural-order packed
    spectrum planar pair (slabs*128, L); see _rfft_planes."""
    L = n // 2
    big = _to_pencil(x, n, slabs)
    out_r, out_i = _rfft_planes(_planes(big, n, slabs), n)
    return (_from_pencil(jnp.concatenate(out_r, axis=0), L, slabs),
            _from_pencil(jnp.concatenate(out_i, axis=0), L, slabs))


def _irfft_planes(xpr, xpi, n: int, scale: float | None = None):
    """Plane-level C2R core: packed-spectrum plane lists (length L) ->
    n real sample planes, scaled by L * (scale or 1) — the reference's
    unnormalized contract (FFT.c:170-171) with an optional extra scalar
    folded for free into the merge constants (the reuse loop's 1/L).

    Z[k] = A X[k] + B conj(X[L-k]), A = (1 + iW^-k)/2, B = (1 - iW^-k)/2;
    inverse half-size ladder; samples re-interleave as alternating
    planes."""
    L = n // 2
    s = 1.0 if scale is None else float(scale)
    z_r, z_i = [None] * L, [None] * L
    z_r[0] = (xpr[0] + xpi[0]) * np.float32(0.5 * s)   # (DC + Nyq)/2
    z_i[0] = (xpr[0] - xpi[0]) * np.float32(0.5 * s)   # (DC - Nyq)/2
    for k in range(1, L):
        m = L - k
        th = 2.0 * math.pi * k / n
        sn, cs = math.sin(th), math.cos(th)
        a_re, a_im = (1.0 - sn) * 0.5 * s, +0.5 * cs * s
        b_re, b_im = (1.0 + sn) * 0.5 * s, -0.5 * cs * s
        if k == L // 2:                 # th = pi/2: A = 0, B = 1
            if scale is None:
                z_r[k], z_i[k] = xpr[m], -xpi[m]
            else:
                sf = np.float32(s)
                z_r[k], z_i[k] = xpr[m] * sf, xpi[m] * np.float32(-s)
            continue
        z_r[k] = (xpr[k] * a_re - xpi[k] * a_im
                  + xpr[m] * b_re + xpi[m] * b_im)
        z_i[k] = (xpr[k] * a_im + xpi[k] * a_re
                  + xpr[m] * b_im - xpi[m] * b_re)
    o_r, o_i = _plane_dft_list(z_r, z_i, +1.0)
    out = [None] * n
    out[0::2] = o_r                     # even samples = real plane
    out[1::2] = o_i                     # odd samples = imag plane
    return out


def _irfft_block(xr, xi, n: int, slabs: int = 8):
    """Fused C2R on one (slabs*128, L) natural-order packed spectrum pair
    -> (slabs*128, n) real signal scaled by L; see _irfft_planes."""
    L = n // 2
    br = _to_pencil(xr, L, slabs)
    bi = _to_pencil(xi, L, slabs)
    out = _irfft_planes(_planes(br, L, slabs), _planes(bi, L, slabs), n)
    return _from_pencil(jnp.concatenate(out, axis=0), n, slabs)


@functools.lru_cache(maxsize=None)
def _build_real(n: int, inverse: bool, interpret: bool = False,
                slabs: int = 8):
    L = n // 2
    rb = slabs * 128

    if interpret:
        def run_host(*arrays):
            with jax.disable_jit():
                outs = []
                for s in range(0, arrays[0].shape[0], rb):
                    blk = [a[s:s + rb] for a in arrays]
                    outs.append(_irfft_block(*blk, n, slabs) if inverse
                                else _rfft_block(*blk, n, slabs))
                if inverse:
                    return jnp.concatenate(outs, axis=0)
                return (jnp.concatenate([o[0] for o in outs], axis=0),
                        jnp.concatenate([o[1] for o in outs], axis=0))
        return run_host

    if inverse:
        def kernel(xr_ref, xi_ref, o_ref):
            o_ref[:] = _irfft_block(xr_ref[:], xi_ref[:], n, slabs)
    else:
        def kernel(x_ref, our_ref, oui_ref):
            o_r, o_i = _rfft_block(x_ref[:], n, slabs)
            our_ref[:] = o_r
            oui_ref[:] = o_i

    real_spec = pl.BlockSpec((rb, n), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    spec_spec = pl.BlockSpec((rb, L), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)

    @jax.jit
    def run(*arrays):
        b = arrays[0].shape[0]
        if inverse:
            in_specs, out_specs = [spec_spec, spec_spec], real_spec
            out_shape = jax.ShapeDtypeStruct((b, n), jnp.float32)
        else:
            in_specs = [real_spec]
            out_specs = (spec_spec, spec_spec)
            out_shape = (jax.ShapeDtypeStruct((b, L), jnp.float32),) * 2
        return pl.pallas_call(
            kernel, grid=(b // rb,),
            in_specs=in_specs, out_specs=out_specs, out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
        )(*arrays)
    return run


def _real_pair_block(x, n: int, pairs: int, slabs: int = 8):
    """``pairs`` x (R2C -> C2R) in-VMEM applications on one real block,
    entirely in pencil plane form — the real-transform reuse loop (the
    R2C FFT_multiple_benchmark analogue,
    SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:435-467; forward-
    only re-application can't keep shapes static, so the loop models the
    in-kernel convolution roundtrip instead).  Each pair folds 1/L into
    the C2R merge constants (free), so the signal is preserved."""
    inv_l = 1.0 / (n // 2)
    big = _to_pencil(x, n, slabs)
    if n <= _PLANE_CARRY_MAX:
        def body(_, planes):
            sr, si = _rfft_planes(list(planes), n)
            return tuple(_irfft_planes(sr, si, n, inv_l))
        pl_ = jax.lax.fori_loop(0, pairs, body,
                                tuple(_planes(big, n, slabs)))
        return _from_pencil(jnp.concatenate(list(pl_), axis=0), n, slabs)

    def body(_, carry):
        sr, si = _rfft_planes(_planes(carry, n, slabs), n)
        return jnp.concatenate(_irfft_planes(sr, si, n, inv_l), axis=0)
    big = jax.lax.fori_loop(0, pairs, body, big)
    return _from_pencil(big, n, slabs)


@functools.lru_cache(maxsize=None)
def _build_real_multiple(n: int, pairs: int, interpret: bool = False,
                         slabs: int = 8):
    rb = slabs * 128

    if interpret:
        def run_host(x):
            with jax.disable_jit():
                outs = [_real_pair_block(x[s:s + rb], n, pairs, slabs)
                        for s in range(0, x.shape[0], rb)]
                return jnp.concatenate(outs, axis=0)
        return run_host

    def kernel(x_ref, o_ref):
        o_ref[:] = _real_pair_block(x_ref[:], n, pairs, slabs)

    spec = pl.BlockSpec((rb, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    vmem_mb = 120 if n >= 4096 else 110

    @jax.jit
    def run(x):
        b = x.shape[0]
        return pl.pallas_call(
            kernel, grid=(b // rb,), in_specs=[spec], out_specs=spec,
            out_shape=jax.ShapeDtypeStruct((b, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_mb * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
        )(x)
    return run


def multiple_real_pencil_planar(x: jnp.ndarray, n: int, iters: int):
    """``iters`` in-VMEM REAL-transform applications (iters/2 R2C->C2R
    pairs) on fp32 rows (B, n); the output equals the input signal up to
    fp32 error (each pair is exact up to the folded 1/L).  Supported for
    256 <= n <= 4096; ``iters`` must be even."""
    _check_n(n, 256, 4096)
    if iters % 2:
        raise ValueError("iters must be even (R2C->C2R pairs)")
    if x.shape[-1] != n:
        raise ValueError(f"expected row width {n}, got {x.shape[-1]}")
    rows = x.shape[0]
    slabs = min(8, max(1, -(-rows // 128)))
    rb = slabs * 128
    pad = (-rows) % rb
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, n), x.dtype)], axis=0)
    out = _build_real_multiple(n, iters // 2, _pc._INTERPRET,
                               slabs)(x.astype(jnp.float32))
    return out[:rows] if pad else out


def _pad_run(arrays, rb, run):
    rows = arrays[0].shape[0]
    pad = (-rows) % rb
    if pad:
        arrays = [jnp.concatenate(
            [a, jnp.zeros((pad, a.shape[1]), a.dtype)], axis=0)
            for a in arrays]
    out = run(*arrays)
    if pad:
        out = (tuple(o[:rows] for o in out) if isinstance(out, tuple)
               else out[:rows])
    return out


def rfft_pencil_planar(x: jnp.ndarray, n: int | None = None):
    """Fused single-pass R2C in pencil layout: real (B, n) fp32 ->
    NATURAL-ORDER packed spectrum planar (B, n/2) pair, slot 0 =
    (DC, Nyquist).  Supported for 256 <= n <= 4096 (the n = 8192 ladder
    exceeds the Mosaic program budget; callers fall back to the matmul
    kernel there)."""
    n = n or x.shape[-1]
    _check_n(n, 256, 4096)
    if x.shape[-1] != n:
        raise ValueError(f"expected row width {n}, got {x.shape[-1]}")
    slabs = min(8, max(1, -(-x.shape[0] // 128)))
    run = _build_real(n, False, _pc._INTERPRET, slabs)
    return _pad_run([x.astype(jnp.float32)], slabs * 128, run)


def irfft_pencil_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int):
    """Fused single-pass C2R in pencil layout: NATURAL-ORDER packed
    spectrum planar (B, n/2) pair -> real (B, n) scaled by n/2 (the
    reference's unnormalized contract).  Supported for
    256 <= n <= 4096."""
    _check_n(n, 256, 4096)
    if vr.shape[-1] != n // 2:
        raise ValueError(f"expected row width {n // 2}, got {vr.shape[-1]}")
    slabs = min(8, max(1, -(-vr.shape[0] // 128)))
    run = _build_real(n, True, _pc._INTERPRET, slabs)
    return _pad_run([vr.astype(jnp.float32), vi.astype(jnp.float32)],
                    slabs * 128, run)


def fft_pencil_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int,
                      inverse: bool = False, scale=None):
    """Single-pass natural-order FFT in pencil layout — the ordered
    external path for N = 256/512, where the one-time relayout + pure-VPU
    ladder hides fully under the HBM stream (658/655 GB/s device-measured
    on v5e vs 460-470 for the matmul tdot_rows merge, whose c-row block
    slices are sub-sublane-granule at c < 8).

    Unnormalized forward/inverse DFT semantics (matching fft_planar);
    ``scale`` is an optional scalar fused into the load."""
    _check_n(n)
    if vr.shape[-1] != n:
        raise ValueError(f"expected row width {n}, got {vr.shape[-1]}")
    rows = vr.shape[0]
    slabs = _pick_slabs(n, rows)
    pad = (-rows) % (slabs * 128)
    if pad:
        zeros = jnp.zeros((pad, n), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    run = _build(n, 1, inverse, _pc._INTERPRET, per_iter_scale=False,
                 fused_scale=scale is not None, slabs=slabs)
    if scale is not None:
        o_r, o_i = run(vr, vi, jnp.asarray(scale, jnp.float32))
    else:
        o_r, o_i = run(vr, vi)
    if pad:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i
