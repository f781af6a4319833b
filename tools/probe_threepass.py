"""Per-pass timing of the hugefft three-pass pipeline at one size.

Usage: probe_threepass.py <exp>
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from smfft_tpu.utils.prof_timing import device_time_ms
from smfft_tpu.ops import hugefft as H

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))


def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()


if __name__ == "__main__":
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << e
    m = n // 128
    B = max(8, min(256, (192 << 20) // (8 * n))) // 8 * 8
    xr, xi = data(B, n, 1), data(B, n, 2)
    nbytes = B * n * 16

    p0 = H._build_p0(n, m, H._p0_tile(m))
    p1 = H._build_p1(n, m, False, "highest", 1.0)
    p2c = H._build_p2_contract(m, H._p2c_tile(m), False, "highest")

    def f0():
        o = p0(xr, xi)
        float(force(o[0]))
    ms0 = device_time_ms(f0, reps=5, match=r"^jit_run_p0")
    print(f"2^{e} B={B} P0: {nbytes / ms0 / 1e6:5.0f} GB/s")
    zr, zi = p0(xr, xi)
    jax.block_until_ready(zr)

    def f1():
        o = p1(zr, zi)
        float(force(o[0]))
    ms1 = device_time_ms(f1, reps=5, match=r"^jit_run_p1")
    print(f"2^{e} B={B} P1: {nbytes / ms1 / 1e6:5.0f} GB/s")
    wr, wi = p1(zr, zi)
    jax.block_until_ready(wr)

    def f2():
        o = p2c(wr, wi)
        float(force(o[0]))
    ms2 = device_time_ms(f2, reps=5, match=r"^jit_run_p2c")
    print(f"2^{e} B={B} P2c: {nbytes / ms2 / 1e6:5.0f} GB/s")
    tot = ms0 + ms1 + ms2
    print(f"2^{e} end-to-end eff: {nbytes / tot / 1e6:5.0f} GB/s")
