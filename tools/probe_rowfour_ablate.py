"""Ablate the rowfour single-pass kernel stage by stage to find where
the 656 GB/s roofline goes (measured ~200 GB/s end-to-end)."""
import sys
sys.path.insert(0, ".")
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from smfft_tpu.utils.prof_timing import device_time_ms
from smfft_tpu.ops import pallas_c2c as _pc
from smfft_tpu.ops import rowfour as RF

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))


def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()


def build_ablate(n, n1, n2, sb, stage, precision="highest"):
    """stage: 'copy' | 'reshape' | 'fft1' | 'twiddle' | 'full'"""
    prec1 = _pc.resolve_scheme(precision, n1)
    prec2 = _pc.resolve_scheme(precision, n2)
    nc1 = _pc.n_consts(n1, prec1)
    nc2 = RF.n_stage2_consts(prec2)

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts1 = _pc.read_consts(refs[2:2 + nc1])
        wconsts = tuple(r[:] for r in refs[2 + nc1:2 + nc1 + nc2])
        tw = tuple(r[:] for r in refs[2 + nc1 + nc2:2 + nc1 + nc2 + 4])
        o_r, o_i = refs[2 + nc1 + nc2 + 4:]
        ar, ai = x_r[:], x_i[:]
        if stage == "copy":
            o_r[:], o_i[:] = ar, ai
            return
        xr = jnp.transpose(ar.reshape(sb, n1, n2), (0, 2, 1)).reshape(-1, n1)
        xi = jnp.transpose(ai.reshape(sb, n1, n2), (0, 2, 1)).reshape(-1, n1)
        if stage == "reshape":
            o_r[:], o_i[:] = (jnp.transpose(xr.reshape(sb, n2, n1), (0, 2, 1)).reshape(sb, n),
                              jnp.transpose(xi.reshape(sb, n2, n1), (0, 2, 1)).reshape(sb, n))
            return
        zr, zi = _pc.emit_fft(xr, xi, consts1, n=n1, inverse=False,
                              precision=prec1, ordered=True)
        if stage == "fft1":
            o_r[:], o_i[:] = zr.reshape(sb, n), zi.reshape(sb, n)
            return
        zr, zi = RF._apply_twiddle_b(zr, zi, *tw, sb, n2, n1)
        if stage == "twiddle":
            o_r[:], o_i[:] = zr.reshape(sb, n), zi.reshape(sb, n)
            return
        cr, ci = RF._sublane_dft(zr, zi, wconsts, sb, n2, n1, prec2)
        o_r[:], o_i[:] = cr.reshape(sb, n), ci.reshape(sb, n)

    spec = pl.BlockSpec((sb, n), lambda b: (b, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2 + 4)
    consts = (_pc.const_arrays(n1, False, prec1)
              + RF.stage2_consts(n2, False, prec2))
    from smfft_tpu.ops.fourstep_fused import _twiddle_split_tables
    tw_np = _twiddle_split_tables(n, n1, n2, False, 1.0)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        cost = pl.CostEstimate(flops=int(6 * n * np.log2(n) * b),
                               bytes_accessed=b * n * 4 * 4,
                               transcendentals=0)
        cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                  dimension_semantics=("arbitrary",))
        return pl.pallas_call(
            kernel, grid=(b // sb,),
            in_specs=[spec, spec] + const_specs,
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
        )(vr, vi, *consts, *(jnp.asarray(t) for t in tw_np))
    return run


for n, (n1, n2) in sorted(RF.FACTORS.items()):
    B = max(8, min(512, (256 << 20) // (8 * n)))
    xr, xi = data(B, n, 1), data(B, n, 2)
    nbytes = B * n * 16
    row = [f"2^{int(np.log2(n)):2d} ({n1}x{n2}) B={B:4d}:"]
    for stage in ("copy", "reshape", "fft1", "twiddle", "full"):
        run = build_ablate(n, n1, n2, 8, stage)
        def f():
            o = run(xr, xi)
            float(force(o[0]))
        ms = device_time_ms(f, reps=5, match=r"^jit_run")
        row.append(f"{stage} {nbytes / ms / 1e6:5.0f}")
    print("  ".join(row))
