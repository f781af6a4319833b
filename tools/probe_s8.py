"""Probe the retile-free two-pass huge-N structure (S8):

  P0: pallas transpose pass (B, n) -> (B*128, n1)   [1 HBM round trip]
  P2: contiguous (128, n1) read -> emit_fft(n1) -> twiddle ->
      sublane 128-DFT -> reshape (1, n) -> contiguous (B, n) write

and three stage-2 sublane-DFT variants:
  dense  — current rowfour _sublane_dft (4 real dots x split passes)
  packed — symmetry-packed 2 dots + J-matmul row mirror
  twolvl — 16x8 two-level dense with in-VMEM row permute
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

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
LANES = 128


def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()


# --------------------------------------------------------------------------
# stage-2 variants operating on (sb*128, n1) planar rows [t2 row, k1 lane]
# --------------------------------------------------------------------------

def _packed_m2(inverse: bool):
    """(128,128) row-packed sublane DFT matrix [C rows 0..64; S rows 1..63]
    + x3 bf16 splits, plus the (63,63) reversal matrix J."""
    sign = +1.0 if inverse else -1.0
    cr, si = _pc._dftmat(LANES, sign)
    m = np.concatenate([cr[:65], si[1:64]], axis=0).astype(np.float32)
    j = np.zeros((63, 63), np.float32)
    for r in range(63):
        j[r, 62 - r] = 1.0
    return (m,) + _pc._np_split_bf16_3(m) + (j,)


def stage2_packed(zr, zi, consts, sb, n1):
    """2 packed dots (x3 splits) + slice/add recon + J-matmul mirror."""
    m, mh, mm, ml, jm = consts
    zr = zr.reshape(sb, LANES, n1)
    zi = zi.reshape(sb, LANES, n1)

    def bc(x):
        return jnp.broadcast_to(x[None], (sb,) + x.shape)
    pr = RF._split_dot_l((bc(mh), bc(mm), bc(ml)), zr, "x3")
    pi = RF._split_dot_l((bc(mh), bc(mm), bc(ml)), zi, "x3")
    # rows: P[0..64] = C-products, P[65..127] = S-products of rows 1..63
    c_r, c_i = pr[:, 1:64], pi[:, 1:64]
    s_r, s_i = pr[:, 65:], pi[:, 65:]
    top_r, top_i = c_r - s_i, s_r + c_i            # k2 = 1..63
    b_r, b_i = c_r + s_i, c_i - s_r                # need rows reversed
    jb = bc(jm)
    dims = (((2,), (1,)), ((0,), (0,)))
    bot_r = jax.lax.dot_general(jb, b_r, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
    bot_i = jax.lax.dot_general(jb, b_i, dimension_numbers=dims,
                                preferred_element_type=jnp.float32)
    out_r = jnp.concatenate(
        [pr[:, 0:1], top_r, pr[:, 64:65], bot_r], axis=1)
    out_i = jnp.concatenate(
        [pi[:, 0:1], top_i, pi[:, 64:65], bot_i], axis=1)
    return out_r, out_i


def _twolvl_consts(inverse: bool):
    sign = +1.0 if inverse else -1.0
    c16, s16 = _pc._dftmat(16, sign)
    c8, s8 = _pc._dftmat(8, sign)
    # twiddle W_128^{t_b * k_a}: (16 k_a, 8 t_b)
    ka = np.arange(16)[:, None]
    tb = np.arange(8)[None, :]
    ang = sign * 2 * np.pi * ka * tb / 128.0
    return (c16.astype(np.float32), s16.astype(np.float32),
            c8.astype(np.float32), s8.astype(np.float32),
            np.cos(ang).astype(np.float32).reshape(128, 1),
            np.sin(ang).astype(np.float32).reshape(128, 1))


def stage2_twolvl(zr, zi, consts, sb, n1):
    """128-DFT over rows as 16 (major) x 8 (minor) dense levels."""
    c16, s16, c8, s8, twr, twi = consts
    zr = zr.reshape(sb, 16, 8, n1)
    zi = zi.reshape(sb, 16, 8, n1)
    dims = (((1,), (1,)), ((), ()))  # (16k,16t) x (sb,16t,8,n1) -> ?
    # contract dim1 (t_a) with (16,16): use dot_general with batching on sb
    dimsb = (((2,), (1,)), ((0,), (0,)))

    def bc(x):
        return jnp.broadcast_to(x[None], (sb,) + x.shape)

    def cmat(wr, wi, xr, xi, d):
        rr = jax.lax.dot_general(wr, xr, dimension_numbers=d,
                                 preferred_element_type=jnp.float32)
        ri = jax.lax.dot_general(wr, xi, dimension_numbers=d,
                                 preferred_element_type=jnp.float32)
        ir = jax.lax.dot_general(wi, xr, dimension_numbers=d,
                                 preferred_element_type=jnp.float32)
        ii = jax.lax.dot_general(wi, xi, dimension_numbers=d,
                                 preferred_element_type=jnp.float32)
        return rr - ii, ri + ir
    # level 1: contract t_a (dim1 of (sb,16,8,n1)); w (sb,16,16)
    d1 = (((2,), (1,)), ((0,), (0,)))
    ar = zr.reshape(sb, 16, 8 * n1)
    ai = zi.reshape(sb, 16, 8 * n1)
    yr, yi = cmat(bc(c16), bc(s16), ar, ai, d1)   # (sb, k_a16, 8*n1)
    yr = yr.reshape(sb, 128, n1)
    yi = yi.reshape(sb, 128, n1)
    # twiddle rows (k_a, t_b) flattened to 128
    tr, ti = bc(jnp.asarray(twr)), bc(jnp.asarray(twi))
    ur = yr * tr - yi * ti
    ui = yr * ti + yi * tr
    # level 2: contract t_b (dim2 of (sb,16,8,n1))
    ur = ur.reshape(sb, 16, 8, n1)
    ui = ui.reshape(sb, 16, 8, n1)
    ur = jnp.transpose(ur, (0, 2, 1, 3)).reshape(sb, 8, 16 * n1)
    ui = jnp.transpose(ui, (0, 2, 1, 3)).reshape(sb, 8, 16 * n1)
    vr, vi = cmat(bc(c8), bc(s8), ur, ui, d1)     # (sb, k_b8, 16*n1)
    return vr.reshape(sb, 128, n1), vi.reshape(sb, 128, n1)


# --------------------------------------------------------------------------
# P2 kernel builder
# --------------------------------------------------------------------------

def build_p2(n, n1, stage2, precision="highest", with_input_t=False,
             sb=1):
    """P2: (sb*128, n1) [t2, t1] rows -> (sb, n) ordered FFT rows.
    with_input_t=True instead reads (sb, n) natural and transposes
    in-kernel (rowfour-style, for comparison)."""
    prec1 = _pc.resolve_scheme(precision, n1)
    nc1 = _pc.n_consts(n1, prec1)
    if stage2 == "dense":
        prec2 = _pc.resolve_scheme(precision, LANES)
        s2 = RF.stage2_consts(LANES, False, prec2)
    elif stage2 == "packed":
        s2 = _packed_m2(False)
    else:
        s2 = _twolvl_consts(False)
    nc2 = len(s2)

    def kernel(*refs):
        x_r, x_i = refs[0], refs[1]
        consts1 = _pc.read_consts(refs[2:2 + nc1])
        wconsts = tuple(r[:] for r in refs[2 + nc1:2 + nc1 + nc2])
        tw = tuple(r[:] for r in refs[2 + nc1 + nc2:2 + nc1 + nc2 + 4])
        o_r, o_i = refs[2 + nc1 + nc2 + 4:]
        if with_input_t:
            ar = jnp.transpose(x_r[:].reshape(sb, n1, LANES),
                               (0, 2, 1)).reshape(-1, n1)
            ai = jnp.transpose(x_i[:].reshape(sb, n1, LANES),
                               (0, 2, 1)).reshape(-1, n1)
        else:
            ar, ai = x_r[:], x_i[:]
        zr, zi = _pc.emit_fft(ar, ai, consts1, n=n1, inverse=False,
                              precision=prec1, ordered=True)
        zr, zi = RF._apply_twiddle_b(zr, zi, *tw, sb, LANES, n1)
        if stage2 == "dense":
            cr, ci = RF._sublane_dft(zr, zi, wconsts, sb, LANES, n1,
                                     _pc.resolve_scheme(precision, LANES))
            cr = cr.reshape(sb, LANES, n1)
            ci = ci.reshape(sb, LANES, n1)
        elif stage2 == "packed":
            cr, ci = stage2_packed(zr, zi, wconsts, sb, n1)
        else:
            cr, ci = stage2_twolvl(zr, zi, wconsts, sb, n1)
        o_r[:], o_i[:] = cr.reshape(sb, n), ci.reshape(sb, n)

    if with_input_t:
        in_spec = pl.BlockSpec((sb, n), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)
    else:
        in_spec = pl.BlockSpec((sb * LANES, n1), lambda b: (b, 0),
                               memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((sb, n), lambda b: (b, 0),
                            memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2 + 4)
    consts1 = _pc.const_arrays(n1, False, prec1)
    tw_np = _twiddle_split_tables(n, n1, LANES, False, 1.0)

    @jax.jit
    def run(vr, vi):
        b = (vr.shape[0] if with_input_t else vr.shape[0] // LANES) // sb
        cost = pl.CostEstimate(flops=int(6 * n * np.log2(n) * b * sb),
                               bytes_accessed=b * sb * n * 4 * 4,
                               transcendentals=0)
        cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                  dimension_semantics=("arbitrary",))
        return pl.pallas_call(
            kernel, grid=(b,),
            in_specs=[in_spec, in_spec] + const_specs,
            out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b * sb, n), jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
        )(vr, vi, *(jnp.asarray(c) for c in consts1),
          *(jnp.asarray(c) for c in s2),
          *(jnp.asarray(t) for t in tw_np))
    return run


# --------------------------------------------------------------------------
# P0 transpose pass: (B, n) -> (B*128, n1)
# --------------------------------------------------------------------------

def build_p0(n, n1, t1, sbb=8):
    def kernel(x_r, x_i, o_r, o_i):
        ar = x_r[:].reshape(sbb, t1, LANES)
        ai = x_i[:].reshape(sbb, t1, LANES)
        o_r[:] = jnp.transpose(ar, (0, 2, 1)).reshape(sbb * LANES, t1)
        o_i[:] = jnp.transpose(ai, (0, 2, 1)).reshape(sbb * LANES, t1)

    in_spec = pl.BlockSpec((sbb, t1 * LANES), lambda b, i: (b, i),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((sbb * LANES, t1), lambda b, i: (b, i),
                            memory_space=pltpu.VMEM)

    @jax.jit
    def run(vr, vi):
        b = vr.shape[0]
        cost = pl.CostEstimate(flops=0, bytes_accessed=b * n * 4 * 4,
                               transcendentals=0)
        cp = pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024,
                                  dimension_semantics=("parallel",
                                                       "arbitrary"))
        return pl.pallas_call(
            kernel, grid=(b // sbb, n1 // t1),
            in_specs=[in_spec, in_spec], out_specs=(out_spec, out_spec),
            out_shape=(jax.ShapeDtypeStruct((b * LANES, n1),
                                            jnp.float32),) * 2,
            cost_estimate=cost, compiler_params=cp,
        )(vr, vi)
    return run


def check_correct(n, n1, stage2):
    """Correctness of P0+P2 against numpy on one small batch (on-chip)."""
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n)))
    x = x.astype(np.complex64)
    vr = jnp.asarray(x.real)
    vi = jnp.asarray(x.imag)
    t1 = max(128, min(n1, (4 << 20) // (4 * 128)))
    while n1 % t1:
        t1 //= 2
    p0 = build_p0(n, n1, t1, sbb=2)
    p2 = build_p2(n, n1, stage2, sb=1)
    br, bi = p0(vr, vi)
    outr, outi = p2(br, bi)
    ref = np.fft.fft(x, axis=-1)
    got = np.asarray(outr) + 1j * np.asarray(outi)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"  correctness n=2^{int(np.log2(n))} {stage2}: rel err {err:.2e}")


if __name__ == "__main__":
    exps = [int(a) for a in sys.argv[1:]] or [15, 17]
    for e in exps:
        n = 1 << e
        n1 = n // LANES
        if n1 > 16384:
            continue
        B = max(8, min(256, (192 << 20) // (8 * n)))
        B = (B // 8) * 8
        xr, xi = data(B, n, 1), data(B, n, 2)
        nbytes = B * n * 16
        # P0
        t1 = max(128, min(n1, (4 << 20) // (4 * 128)))
        while n1 % t1:
            t1 //= 2
        p0 = build_p0(n, n1, t1)
        def f0():
            o = p0(xr, xi)
            float(force(o[0]))
        ms0 = device_time_ms(f0, reps=5, match=r"^jit_run")
        print(f"2^{e} B={B}: P0 transpose {nbytes / ms0 / 1e6:5.0f} GB/s")
        br, bi = p0(xr, xi)
        br = jax.block_until_ready(br)
        bi = jax.block_until_ready(bi)
        for stage2 in ("dense", "packed", "twolvl"):
            sb = 1
            try:
                p2 = build_p2(n, n1, stage2, sb=sb)
                def f2():
                    o = p2(br, bi)
                    float(force(o[0]))
                ms2 = device_time_ms(f2, reps=5, match=r"^jit_run")
                eff = nbytes / (ms0 + ms2) / 1e6
                print(f"  P2[{stage2}] {nbytes / ms2 / 1e6:5.0f} GB/s"
                      f"  -> end-to-end eff {eff:5.0f} GB/s")
            except Exception as ex:
                print(f"  P2[{stage2}] FAILED: {str(ex)[:150]}")
    print()
    e0 = exps[0]
    for stage2 in ("dense", "packed", "twolvl"):
        check_correct(1 << e0, (1 << e0) // LANES, stage2)
