"""Per-size hugefft throughput + accuracy on the real TPU.

Usage: probe_hugefft_sweep.py [emin emax [plan]]
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from smfft_tpu.utils.prof_timing import device_time_ms
from smfft_tpu.ops import hugefft as HF

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))


def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()


if __name__ == "__main__":
    emin = int(sys.argv[1]) if len(sys.argv) > 1 else 18
    emax = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    plan = sys.argv[3] if len(sys.argv) > 3 else None
    for e in range(emin, emax + 1):
        n = 1 << e
        b = max(8, min(96, (128 << 20) // (8 * n))) // 8 * 8
        xr, xi = data(b, n, e), data(b, n, 100 + e)
        nbytes = b * n * 16
        try:
            def f():
                out = HF.fft_huge_planar(xr, xi, plan=plan)
                float(force(out[0]))
            ms = device_time_ms(f, reps=3, match=r"^jit_run")
            gbs = nbytes / ms / 1e6
            # accuracy, tiny batch
            rng = np.random.default_rng(e)
            a = rng.standard_normal((2, n)).astype(np.float32)
            c = rng.standard_normal((2, n)).astype(np.float32)
            o_r, o_i = HF.fft_huge_planar(jnp.asarray(a), jnp.asarray(c),
                                          plan=plan)
            ref = np.fft.fft(a.astype(np.float64) + 1j * c.astype(np.float64))
            got = np.asarray(o_r) + 1j * np.asarray(o_i)
            rel = np.max(np.abs(got - ref)) / np.max(np.abs(ref))
            print(f"2^{e} plan={plan or HF._default_plan(n)} b={b}: "
                  f"{gbs:6.1f} GB/s eff, rel err {rel:.2e}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"2^{e} FAILED: {str(ex)[:160]}", flush=True)
