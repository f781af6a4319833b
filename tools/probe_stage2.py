"""Compare sublane-128-DFT (stage-2) variants inside the full rowfour
single-pass kernel, at 2^15..2^17.  Variants:

  dense       — current RF._sublane_dft ("highest": 4 dots x 6 passes)
  packed      — symmetry-packed: 2 HIGHEST dots + slice recon + one
                (64,64) permutation matmul for the row mirror
  packed_x5   — same with manual x5 splits (10 passes vs 12)
  twolvl      — 16x8 two-level dense (HIGHEST) + sublane interleave
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
HI = jax.lax.Precision.HIGHEST


def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()


def consts_packed(inverse, x5=False):
    sign = +1.0 if inverse else -1.0
    cr, si = _pc._dftmat(LANES, sign)
    m = np.concatenate([cr[:65], si[1:64]], axis=0).astype(np.float32)
    # (64,64) mirror: out_bottom[0] = src[0], out_bottom[m'] = src[64-m']
    j = np.zeros((64, 64), np.float32)
    j[0, 0] = 1.0
    for r in range(1, 64):
        j[r, 64 - r] = 1.0
    out = [m, j]
    if x5:
        out.extend(_pc._np_split_bf16_3(m))
    return tuple(out)


def stage2_packed(zr, zi, consts, sb, n1, x5=False):
    m, jm = consts[0], consts[1]
    zr = zr.reshape(sb, LANES, n1)
    zi = zi.reshape(sb, LANES, n1)
    dims = (((2,), (1,)), ((0,), (0,)))

    def bc(x):
        return jnp.broadcast_to(x[None], (sb,) + x.shape)
    if x5:
        ms = tuple(bc(c) for c in consts[2:5])
        pr = RF._split_dot_l(ms, zr, "x5")
        pi = RF._split_dot_l(ms, zi, "x5")
    else:
        mb = bc(m)
        dot = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                                precision=HI,
                                preferred_element_type=jnp.float32)
        pr, pi = dot(mb, zr), dot(mb, zi)
    c_r, c_i = pr[:, 1:64], pi[:, 1:64]
    s_r, s_i = pr[:, 65:], pi[:, 65:]
    top_r, top_i = c_r - s_i, s_r + c_i          # k2 = 1..63
    b_r, b_i = c_r + s_i, c_i - s_r              # rows to be mirrored
    bsrc_r = jnp.concatenate([pr[:, 64:65], b_r], axis=1)   # (sb,64,n1)
    bsrc_i = jnp.concatenate([pi[:, 64:65], b_i], axis=1)
    jb = bc(jm).astype(jnp.bfloat16)
    dotp = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                             preferred_element_type=jnp.float32)

    def permdot(x):
        h, mm, lo = (x.astype(jnp.bfloat16),
                     None, None)
        r1 = x - h.astype(jnp.float32)
        mm = r1.astype(jnp.bfloat16)
        lo = (r1 - mm.astype(jnp.float32)).astype(jnp.bfloat16)
        return dotp(jb, h) + dotp(jb, mm) + dotp(jb, lo)
    bot_r, bot_i = permdot(bsrc_r), permdot(bsrc_i)
    out_r = jnp.concatenate([pr[:, 0:1], top_r, bot_r], axis=1)
    out_i = jnp.concatenate([pi[:, 0:1], top_i, bot_i], axis=1)
    return out_r.reshape(sb * LANES, n1), out_i.reshape(sb * LANES, n1)


def consts_twolvl(inverse):
    sign = +1.0 if inverse else -1.0
    c16, s16 = _pc._dftmat(16, sign)
    c8, s8 = _pc._dftmat(8, sign)
    ka = np.arange(16)[:, None]
    tb = np.arange(8)[None, :]
    ang = sign * 2 * np.pi * ka * tb / 128.0
    return (c16.astype(np.float32), s16.astype(np.float32),
            c8.astype(np.float32), s8.astype(np.float32),
            np.cos(ang).astype(np.float32).reshape(128, 1),
            np.sin(ang).astype(np.float32).reshape(128, 1))


def stage2_twolvl(zr, zi, consts, sb, n1):
    c16, s16, c8, s8, twr, twi = consts
    d1 = (((2,), (1,)), ((0,), (0,)))

    def bc(x):
        return jnp.broadcast_to(x[None], (sb,) + x.shape)

    def cmat(wr, wi, xr, xi):
        dot = functools.partial(jax.lax.dot_general, dimension_numbers=d1,
                                precision=HI,
                                preferred_element_type=jnp.float32)
        rr, ri = dot(wr, xr), dot(wr, xi)
        ir, ii = dot(wi, xr), dot(wi, xi)
        return rr - ii, ri + ir
    # level 1: contract t_a (major 16) over rows: (sb,16,8*n1)
    ar = zr.reshape(sb, 16, 8 * n1)
    ai = zi.reshape(sb, 16, 8 * n1)
    yr, yi = cmat(bc(c16), bc(s16), ar, ai)      # (sb, k_a, 8*n1)
    yr = yr.reshape(sb, 128, n1)
    yi = yi.reshape(sb, 128, n1)
    tr, ti = bc(twr), bc(twi)
    ur = yr * tr - yi * ti
    ui = yr * ti + yi * tr
    # level 2: contract t_b (minor 8): need (sb, 8, 16*n1) with t_b
    # leading -> sublane interleave
    ur = jnp.transpose(ur.reshape(sb, 16, 8, n1),
                       (0, 2, 1, 3)).reshape(sb, 8, 16 * n1)
    ui = jnp.transpose(ui.reshape(sb, 16, 8, n1),
                       (0, 2, 1, 3)).reshape(sb, 8, 16 * n1)
    vr, vi = cmat(bc(c8), bc(s8), ur, ui)        # (sb, k_b, 16*n1)
    # rows (k_b, k_a) -> k2 = k_b*16 + k_a is exactly C-order flatten
    return (vr.reshape(sb * LANES, n1), vi.reshape(sb * LANES, n1))


VARIANTS = {
    "dense": (lambda inv: RF.stage2_consts(LANES, inv, "highest"),
              lambda zr, zi, c, sb, n1: RF._sublane_dft(
                  zr, zi, c, sb, LANES, n1, "highest")),
    "packed": (lambda inv: consts_packed(inv),
               lambda zr, zi, c, sb, n1: stage2_packed(
                   zr, zi, c, sb, n1)),
    "packed_x5": (lambda inv: consts_packed(inv, x5=True),
                  lambda zr, zi, c, sb, n1: stage2_packed(
                      zr, zi, c, sb, n1, x5=True)),
    "twolvl": (lambda inv: consts_twolvl(inv),
               lambda zr, zi, c, sb, n1: stage2_twolvl(
                   zr, zi, c, sb, n1)),
}


def build_rowfour(n, n1, sb, variant, precision="highest"):
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
        ar, ai = x_r[:], x_i[:]
        xr = jnp.transpose(ar.reshape(sb, n1, LANES),
                           (0, 2, 1)).reshape(-1, n1)
        xi = jnp.transpose(ai.reshape(sb, n1, LANES),
                           (0, 2, 1)).reshape(-1, n1)
        zr, zi = _pc.emit_fft(xr, xi, consts1, n=n1, inverse=False,
                              precision=prec1, ordered=True)
        zr, zi = RF._apply_twiddle_b(zr, zi, *tw, sb, LANES, n1)
        cr, ci = s2fn(zr, zi, wconsts, sb, n1)
        o_r[:], o_i[:] = cr.reshape(sb, n), ci.reshape(sb, n)

    spec = pl.BlockSpec((sb, n), lambda b: (b, 0), memory_space=pltpu.VMEM)
    const_specs = [pl.BlockSpec(memory_space=pltpu.VMEM)] * (nc1 + nc2 + 4)
    consts1 = _pc.const_arrays(n1, False, prec1)
    tw_np = _twiddle_split_tables(n, n1, LANES, False, 1.0)

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
        )(vr, vi, *(jnp.asarray(c) for c in consts1),
          *(jnp.asarray(c) for c in s2),
          *(jnp.asarray(t) for t in tw_np))
    return run


if __name__ == "__main__":
    exps = [int(a) for a in sys.argv[1:]] or [15, 16]
    variants = ("dense", "packed", "packed_x5", "twolvl")
    # correctness first (tiny batch, on-chip)
    for v in variants:
        n = 1 << exps[0]
        n1 = n // LANES
        rng = np.random.default_rng(0)
        x = (rng.standard_normal((8, n)) + 1j *
             rng.standard_normal((8, n))).astype(np.complex64)
        run = build_rowfour(n, n1, 8, v)
        o = run(jnp.asarray(x.real), jnp.asarray(x.imag))
        got = np.asarray(o[0]) + 1j * np.asarray(o[1])
        ref = np.fft.fft(x, axis=-1)
        err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
        print(f"correct 2^{exps[0]} {v}: rel {err:.2e}")
    for e in exps:
        n = 1 << e
        n1 = n // LANES
        B = max(8, min(512, (256 << 20) // (8 * n)))
        xr, xi = data(B, n, 1), data(B, n, 2)
        nbytes = B * n * 16
        row = [f"2^{e} B={B}:"]
        for v in variants:
            run = build_rowfour(n, n1, 8, v)
            def f():
                o = run(xr, xi)
                float(force(o[0]))
            ms = device_time_ms(f, reps=5, match=r"^jit_run")
            row.append(f"{v} {nbytes / ms / 1e6:5.0f}")
        print("  ".join(row))
