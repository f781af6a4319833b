"""Pencil-layout in-VMEM reuse kernel — the NREUSES/multiple fast path.

The reference's signature result is its ``_multiple`` benchmark running
1.5-5x faster than the HBM-bound external path by re-applying the FFT
core to shared-memory-resident data (FFT-GPU-32bit.cu:553-572,
README.md:84-91).  The matmul-DFT external kernel cannot reproduce that
ratio: it deliberately spends ~30x more FLOPs per FFT than a radix
ladder to reach 100% of HBM bandwidth, so its in-VMEM loop is MXU-bound
at ~parity with external (BENCH_DETAILS "multiple_ablation").

This kernel recovers the reuse advantage with a layout change instead:
the block of row-FFTs is relayouted ONCE into "pencil" form —
``big (8n, 128)`` where plane j = rows [8j, 8j+8) holds sample j of
8*128 = 1024 independent FFTs — and each of the ``iters`` in-VMEM FFT
applications is then the pure-VPU radix-4 plane ladder
(:func:`pallas_c2c._plane_dft_list`) over the n sublane planes with
python-scalar twiddles: no MXU, no gathers, no per-iteration relayout.
The classic ~5 n log2 n FLOP count applies, and the one-time relayout
(8 slab transposes + a sublane interleave each way) amortizes over the
loop.  Device-measured on v5e: 2.1-2.5x the matmul multiple path at
N = 256-2048 (e.g. 91.9 vs 40.9 MFFT/s at N = 1024) — the reference's
in-kernel-reuse behavior, reproduced the TPU way.

Per-iteration output is natural-order (the DIT list recursion returns
frequency-indexed planes) and scaled by 1/sqrt(n) to keep 100
re-applications bounded (the reference never verifies multiple-path
output, SURVEY.md §4; ours is verified for one iteration in tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smfft_tpu.ops import pallas_c2c as _pc
from smfft_tpu.ops.pallas_c2c import _plane_dft_list

R_BLOCK = 1024  # FFTs per grid block: 8 slabs x 128 lanes


def _pencil_block(xr, xi, n: int, iters: int, sign: float):
    """The per-(1024, n)-block transform body — pure jnp, shared by the
    Pallas kernel and the compiled CPU fallback (the interpreter is far
    too slow for the unrolled n-plane ladder)."""
    scale = np.float32(1.0 / np.sqrt(float(n)))

    def to_pencil(x):
        slabs = [jnp.transpose(x[r * 128:(r + 1) * 128, :])
                 for r in range(8)]
        return jnp.stack(slabs, axis=1).reshape(8 * n, 128)
    br = to_pencil(xr)
    bi = to_pencil(xi)

    def body(_, carry):
        cr, ci = carry
        pr = [cr[8 * j:8 * (j + 1)] for j in range(n)]
        pi = [ci[8 * j:8 * (j + 1)] for j in range(n)]
        o_r, o_i = _plane_dft_list(pr, pi, sign)
        return (jnp.concatenate(o_r, axis=0) * scale,
                jnp.concatenate(o_i, axis=0) * scale)
    br, bi = jax.lax.fori_loop(0, iters, body, (br, bi))

    def from_pencil(b):
        b3 = b.reshape(n, 8, 128)
        return jnp.concatenate(
            [jnp.transpose(b3[:, r, :]) for r in range(8)], axis=0)
    return from_pencil(br), from_pencil(bi)


@functools.lru_cache(maxsize=None)
def _build(n: int, iters: int, inverse: bool, interpret: bool = False):
    sign = +1.0 if inverse else -1.0

    if interpret:
        # eager per-block loop on the host platform: the Pallas
        # interpreter is hours-slow on the unrolled ladder and XLA:CPU
        # compile of the ~n*log(n)-op graph takes minutes under the
        # 8-virtual-device test config, while eager runs it in ~1 s
        def run_host(vr, vi):
            with jax.disable_jit():
                outs = [_pencil_block(vr[s:s + R_BLOCK],
                                      vi[s:s + R_BLOCK], n, iters, sign)
                        for s in range(0, vr.shape[0], R_BLOCK)]
                return (jnp.concatenate([o[0] for o in outs], axis=0),
                        jnp.concatenate([o[1] for o in outs], axis=0))
        return run_host

    def kernel(xr_ref, xi_ref, our_ref, oui_ref):
        o_r, o_i = _pencil_block(xr_ref[:], xi_ref[:], n, iters, sign)
        our_ref[:] = o_r
        oui_ref[:] = o_i

    spec = pl.BlockSpec((R_BLOCK, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        return pl.pallas_call(
            kernel, grid=(b // R_BLOCK,),
            in_specs=[spec, spec], out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
        )(vr, vi)
    return run


def multiple_pencil_planar(vr: jnp.ndarray, vi: jnp.ndarray, n: int,
                           iters: int, inverse: bool = False):
    """``iters`` in-VMEM FFT re-applications in pencil layout.

    vr/vi: planar fp32 (B, n), one FFT per row, B a multiple of 1024
    (padded internally otherwise).  Returns the planar pair after
    ``iters`` applications, each natural-order and scaled by 1/sqrt(n).
    Supported for 256 <= n <= 2048 (the n = 4096 unrolled ladder
    exceeds the Mosaic program budget; callers fall back to the matmul
    multiple path there).
    """
    if not 256 <= n <= 2048:
        raise ValueError("multiple_pencil supports 256 <= n <= 2048")
    if vr.shape[-1] != n:
        raise ValueError(f"expected row width {n}, got {vr.shape[-1]}")
    rows = vr.shape[0]
    pad = (-rows) % R_BLOCK
    if pad:
        zeros = jnp.zeros((pad, n), vr.dtype)
        vr = jnp.concatenate([vr, zeros], axis=0)
        vi = jnp.concatenate([vi, zeros], axis=0)
    o_r, o_i = _build(n, iters, inverse, _pc._INTERPRET)(vr, vi)
    if pad:
        o_r, o_i = o_r[:rows], o_i[:rows]
    return o_r, o_i
