"""Device-timed probe of the fused two-pass four-step vs jnp.fft.

Usage: python tools/probe_fused_fourstep.py [log2_sizes...]
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from smfft_tpu.ops import fourstep_fused as FF
from smfft_tpu.utils.prof_timing import device_time_ms

def main():
    exps = [int(a) for a in (sys.argv[1:] or [16, 20, 24])]
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
    for e in exps:
        n = 1 << e
        B = max(1, (192 << 20) // (8 * n))   # ~192 MB complex working set
        xr = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(1), (B, n), jnp.float32, -0.5, 0.5))()
        xi = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(2), (B, n), jnp.float32, -0.5, 0.5))()

        @jax.jit
        def fused_run(r, i):
            return FF.fft_large_planar(r, i)

        def f():
            o = fused_run(xr, xi)
            float(force(o[0]))
        nbytes = B * n * 8 * 2
        try:
            ms = device_time_ms(f, reps=5, match=r"^jit_fused_run")
            gbs = nbytes / ms / 1e6
            print(f"n=2^{e} B={B} fused: {ms:8.3f} ms  {gbs:6.1f} GB/s eff")
        except Exception as ex:
            print(f"n=2^{e} fused FAILED: {str(ex)[:200]}")
            continue

        @jax.jit
        def jnp_run(r, i):
            z = jnp.fft.fft(jax.lax.complex(r, i))
            return jnp.real(z), jnp.imag(z)

        def g():
            o = jnp_run(xr, xi)
            float(force(o[0]))
        try:
            ms = device_time_ms(g, reps=5, match=r"^jit_jnp_run")
            print(f"         jnp.fft: {ms:8.3f} ms  {nbytes/ms/1e6:6.1f} GB/s eff")
        except Exception as ex:
            print(f"         jnp.fft FAILED: {str(ex)[:160]}")

        # correctness on first row
        o = fused_run(xr, xi)
        got = np.asarray(o[0][0]).astype(np.complex128) + 1j * np.asarray(o[1][0])
        want = np.fft.fft(np.asarray(xr[0]).astype(np.float64)
                          + 1j * np.asarray(xi[0]).astype(np.float64))
        print(f"         max abs err row0: {np.max(np.abs(got - want)):.3e}")

if __name__ == "__main__":
    main()
