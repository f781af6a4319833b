"""Probe S8 pass-2 designs (after the roofline P0 transpose):

  direct — grid (B//8, 8): in block (128, n1) per batch, out block
           (8, n) revisited 8x, row i written per step.  2-pass total.
  layout — grid (B,): in (128, n1) -> out (128, n1) [k2 rows] + a
           separate P4 retile pass (B*128, n1) -> (B, n).  3-pass.

Usage: probe_p2.py <exp> [stage2]
"""
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
from smfft_tpu.ops.fourstep_fused import _twiddle_split_tables
from tools.probe_s8 import build_p0
from tools.probe_stage2 import VARIANTS

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
LANES = 128


def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()


def build_p2_direct(n, n1, variant="packed", precision="highest"):
    prec1 = _pc.resolve_scheme(precision, n1)
    nc1 = _pc.n_consts(n1, prec1)
    mk_consts, s2fn = VARIANTS[variant]
    s2 = mk_consts(False)
    nc2 = len(s2)

    def kernel(*refs):
        i = pl.program_id(1)
        x_r, x_i = refs[0], refs[1]
        consts1 = _pc.read_consts(refs[2:2 + nc1])
        wconsts = tuple(r[:] for r in refs[2 + nc1:2 + nc1 + nc2])
        tw = tuple(r[:] for r in refs[2 + nc1 + nc2:2 + nc1 + nc2 + 4])
        o_r, o_i = refs[2 + nc1 + nc2 + 4:]
        ar, ai = x_r[:], x_i[:]            # (128, n1) [t2, t1]
        zr, zi = _pc.emit_fft(ar, ai, consts1, n=n1, inverse=False,
                              precision=prec1, ordered=True)
        zr, zi = RF._apply_twiddle_b(zr, zi, *tw, 1, LANES, n1)
        cr, ci = s2fn(zr, zi, wconsts, 1, n1)
        o_r[pl.ds(i, 1), :] = cr.reshape(1, n)
        o_i[pl.ds(i, 1), :] = ci.reshape(1, n)

    in_spec = pl.BlockSpec((LANES, n1), lambda g, i: (g * 8 + i, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, n), lambda g, i: (g, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2 + 4)
    consts1 = _pc.const_arrays(n1, False, prec1)
    tw_np = _twiddle_split_tables(n, n1, LANES, False, 1.0)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0] // LANES
        cost = pl.CostEstimate(flops=int(6 * n * np.log2(n) * b),
                               bytes_accessed=b * n * 4 * 4,
                               transcendentals=0)
        cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                  dimension_semantics=("parallel",
                                                       "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(b // 8, 8),
            in_specs=[in_spec, in_spec] + const_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
        )(vr, vi, *(jnp.asarray(c) for c in consts1),
          *(jnp.asarray(c) for c in s2),
          *(jnp.asarray(t) for t in tw_np))
    return run


def build_p2_layout(n, n1, variant="packed", precision="highest"):
    """P2 writing (128, n1) [k2 rows] blocks; needs P4 retile after."""
    prec1 = _pc.resolve_scheme(precision, n1)
    nc1 = _pc.n_consts(n1, prec1)
    mk_consts, s2fn = VARIANTS[variant]
    s2 = mk_consts(False)
    nc2 = len(s2)

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts1 = _pc.read_consts(refs[2:2 + nc1])
        wconsts = tuple(r[:] for r in refs[2 + nc1:2 + nc1 + nc2])
        tw = tuple(r[:] for r in refs[2 + nc1 + nc2:2 + nc1 + nc2 + 4])
        o_r, o_i = refs[2 + nc1 + nc2 + 4:]
        zr, zi = _pc.emit_fft(x_r[:], x_i[:], consts1, n=n1,
                              inverse=False, precision=prec1, ordered=True)
        zr, zi = RF._apply_twiddle_b(zr, zi, *tw, 1, LANES, n1)
        cr, ci = s2fn(zr, zi, wconsts, 1, n1)
        o_r[:], o_i[:] = cr.reshape(LANES, n1), ci.reshape(LANES, n1)

    spec = pl.BlockSpec((LANES, n1), lambda b: (b, 0),
                        memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2 + 4)
    consts1 = _pc.const_arrays(n1, False, prec1)
    tw_np = _twiddle_split_tables(n, n1, LANES, False, 1.0)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0] // LANES
        cost = pl.CostEstimate(flops=int(6 * n * np.log2(n) * b),
                               bytes_accessed=b * n * 4 * 4,
                               transcendentals=0)
        cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                  dimension_semantics=("arbitrary",))
        return pl.pallas_call(
            kernel, grid=(b,),
            in_specs=[spec, spec] + const_specs,
            out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((b * LANES, n1),
                                            jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
        )(vr, vi, *(jnp.asarray(c) for c in consts1),
          *(jnp.asarray(c) for c in s2),
          *(jnp.asarray(t) for t in tw_np))
    return run


def build_p4(n, n1, k=8):
    """Retile (B*128, n1) -> (B, n): grid (B//8, 128//k, 8)."""
    def kernel(x_r, x_i, o_r, o_i):
        i = pl.program_id(2)
        o_r[pl.ds(i, 1), :] = x_r[:].reshape(1, k * n1)
        o_i[pl.ds(i, 1), :] = x_i[:].reshape(1, k * n1)

    in_spec = pl.BlockSpec(
        (k, n1), lambda g, j, i: ((g * 8 + i) * (LANES // k) + j, 0),
        memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((8, k * n1), lambda g, j, i: (g, j),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0] // LANES
        cost = pl.CostEstimate(flops=0, bytes_accessed=b * n * 4 * 4,
                               transcendentals=0)
        cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                  dimension_semantics=("parallel",
                                                       "arbitrary",
                                                       "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(b // 8, LANES // k, 8),
            in_specs=[in_spec, in_spec], out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
        )(vr, vi)
    return run


if __name__ == "__main__":
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    variant = sys.argv[2] if len(sys.argv) > 2 else "packed"
    n = 1 << e
    n1 = n // LANES
    # correctness (B=8)
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((8, n)) + 1j *
         rng.standard_normal((8, n))).astype(np.complex64)
    t1 = max(128, min(n1, (4 << 20) // (4 * 128)))
    while n1 % t1:
        t1 //= 2
    p0 = build_p0(n, n1, t1)
    br, bi = p0(jnp.asarray(x.real), jnp.asarray(x.imag))
    ref = np.fft.fft(x, axis=-1)
    for name, mk in (("direct", build_p2_direct),
                     ("layout", build_p2_layout)):
        try:
            p2 = mk(n, n1, variant)
            o = p2(br, bi)
            if name == "layout":
                p4 = build_p4(n, n1)
                o = p4(*o)
            got = np.asarray(o[0]) + 1j * np.asarray(o[1])
            err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
            print(f"correct 2^{e} {name}[{variant}]: rel {err:.2e}")
        except Exception as ex:
            print(f"correct 2^{e} {name}[{variant}] FAILED: "
                  f"{str(ex)[:160]}")
    # timing
    B = max(8, min(256, (192 << 20) // (8 * n)))
    B = (B // 8) * 8
    xr, xi = data(B, n, 1), data(B, n, 2)
    nbytes = B * n * 16
    def f0():
        o = p0(xr, xi)
        float(force(o[0]))
    ms0 = device_time_ms(f0, reps=5, match=r"^jit_run")
    print(f"2^{e} B={B}: P0 {nbytes / ms0 / 1e6:5.0f} GB/s")
    br, bi = jax.block_until_ready(p0(xr, xi)[0]), None
    brr = p0(xr, xi)
    br, bi = brr[0], brr[1]
    jax.block_until_ready(br)
    for name, mk in (("direct", build_p2_direct),
                     ("layout", build_p2_layout)):
        try:
            p2 = mk(n, n1, variant)
            def f2():
                o = p2(br, bi)
                float(force(o[0]))
            ms2 = device_time_ms(f2, reps=5, match=r"^jit_run")
            tot = ms0 + ms2
            extra = ""
            if name == "layout":
                p4 = build_p4(n, n1)
                cr, ci = p2(br, bi)
                jax.block_until_ready(cr)
                def f4():
                    o = p4(cr, ci)
                    float(force(o[0]))
                ms4 = device_time_ms(f4, reps=5, match=r"^jit_run")
                tot += ms4
                extra = f"  P4 {nbytes / ms4 / 1e6:5.0f}"
            print(f"  P2-{name}[{variant}] {nbytes / ms2 / 1e6:5.0f} GB/s"
                  f"{extra}  -> end-to-end eff {nbytes / tot / 1e6:5.0f}")
        except Exception as ex:
            print(f"  P2-{name}[{variant}] FAILED: {str(ex)[:200]}")
