"""Device probe for ops/hugefft.py: correctness vs numpy + end-to-end
effective GB/s at one size.

Usage: probe_hugefft.py <exp> [two:revisit|two:fold|three]
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
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    mode = sys.argv[2] if len(sys.argv) > 2 else None
    n = 1 << e
    rng = np.random.default_rng(0)
    b0 = 8
    x = (rng.standard_normal((b0, n)) + 1j *
         rng.standard_normal((b0, n))).astype(np.complex64)
    o = H.fft_huge_planar(jnp.asarray(x.real), jnp.asarray(x.imag),
                          plan=mode)
    got = np.asarray(o[0]) + 1j * np.asarray(o[1])
    ref = np.fft.fft(x.astype(np.complex128), axis=-1)
    err = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
    print(f"correct 2^{e} [{mode}]: rel {err:.2e}")
    oi = H.fft_huge_planar(o[0], o[1], inverse=True, scale=1.0 / n,
                           plan=mode)
    rt = np.max(np.abs(np.asarray(oi[0]) + 1j * np.asarray(oi[1]) - x))
    print(f"roundtrip 2^{e}: {rt:.2e}")

    B = max(8, min(256, (192 << 20) // (8 * n))) // 8 * 8
    xr, xi = data(B, n, 1), data(B, n, 2)
    nbytes = B * n * 16

    def f():
        o = H.fft_huge_planar(xr, xi, plan=mode)
        float(force(o[0]))
    ms = device_time_ms(f, reps=5, match=r"^jit_run")
    print(f"2^{e} B={B} [{mode}]: {nbytes / ms / 1e6:5.0f} GB/s effective")
