"""Device-timed probe of the fused rfft_large/irfft_large vs the
round-3 XLA glue numbers (3.2 GB/s at 2**21, BENCH_r03).

Usage: python tools/probe_real_fused.py [log2_real_sizes...]
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from smfft_tpu import planar
from smfft_tpu.utils.prof_timing import device_time_ms


def main():
    exps = [int(a) for a in (sys.argv[1:] or [17, 21, 25])]
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
    for e in exps:
        n = 1 << e
        B = max(8, (384 << 20) // (4 * n))   # ~384 MB real working set
        x = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(1), (B, n), jnp.float32, -0.5, 0.5))()

        @jax.jit
        def fwd(v):
            return planar.rfft_large(v)

        try:
            hr, hi = fwd(x)
            got = (np.asarray(hr[0]).astype(np.complex128)
                   + 1j * np.asarray(hi[0]))
            want = np.fft.rfft(np.asarray(x[0]).astype(np.float64))
            err = np.max(np.abs(got[1:] - want[1:-1])) / np.max(np.abs(want))
            e0 = max(abs(got[0].real - want[0].real),
                     abs(got[0].imag - want[-1].real)) / np.max(np.abs(want))
        except Exception as ex:
            print(f"n=2^{e} rfft_large FAILED: {str(ex)[:300]}")
            continue

        def f():
            o = fwd(x)
            float(force(o[0]))
        # in (N reals) + out (N/2 complex) = 8 bytes/point each way
        nbytes = B * n * 4 * 2
        ms = device_time_ms(f, reps=5, match=r"^jit_fwd")
        print(f"n=2^{e} B={B} rfft_large: {ms:8.3f} ms "
              f"{nbytes/ms/1e6:6.1f} GB/s  rel_err={err:.2e} "
              f"slot0={e0:.2e}")

        @jax.jit
        def inv(r, i):
            return planar.irfft_large(r, i, n)

        back = inv(hr, hi)
        rerr = float(jnp.max(jnp.abs(back[0] - x[0])))

        def g():
            o = inv(hr, hi)
            float(force(o))
        ms = device_time_ms(g, reps=5, match=r"^jit_inv")
        print(f"            irfft_large: {ms:8.3f} ms "
              f"{nbytes/ms/1e6:6.1f} GB/s  roundtrip={rerr:.2e}")


if __name__ == "__main__":
    main()
