"""Device-timed probe of the single-pass rowfour kernel vs the existing
row kernels / jnp.fft.

Usage: python tools/probe_rowfour.py [sizes...]
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from smfft_tpu.ops import rowfour as RF
from smfft_tpu.utils.prof_timing import device_time_ms


def main():
    sizes = [int(a) for a in (sys.argv[1:] or [8192, 16384, 32768, 65536,
                                               131072, 262144])]
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
    for n in sizes:
        B = max(8, (96 << 20) // (8 * n))
        xr = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(1), (B, n), jnp.float32, -0.5, 0.5))()
        xi = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(2), (B, n), jnp.float32, -0.5, 0.5))()

        @jax.jit
        def rf_run(r, i):
            return RF.fft_rowfour_planar(r, i)

        nbytes = B * n * 8 * 2
        try:
            o = rf_run(xr, xi)
            got = (np.asarray(o[0][0]).astype(np.complex128)
                   + 1j * np.asarray(o[1][0]))
            want = np.fft.fft(np.asarray(xr[0]).astype(np.float64)
                              + 1j * np.asarray(xi[0]).astype(np.float64))
            err = np.max(np.abs(got - want))
        except Exception as ex:
            print(f"n={n} rowfour FAILED: {str(ex)[:300]}")
            continue

        def f():
            o = rf_run(xr, xi)
            float(force(o[0]))
        ms = device_time_ms(f, reps=5, match=r"^jit_rf_run")
        print(f"n={n:6d} B={B:4d} rowfour: {ms:8.3f} ms "
              f"{nbytes/ms/1e6:6.1f} GB/s  err={err:.3e}")


if __name__ == "__main__":
    main()
