"""In-VMEM reuse at N = 16384 via the rowfour kernel (multiple_iters):
does the MXU-matmul core beat the external matmul kernel's losing reuse
row (BENCH_DETAILS 16384 multiple 2.13 vs external 2.27 MFFT/s)?
"""
import sys
sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from smfft_tpu.utils.prof_timing import device_time_ms
from smfft_tpu.ops import rowfour as RF
from smfft_tpu.ops import pallas_c2c as PC

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
ITERS = 100

if __name__ == "__main__":
    n = 16384
    B = 256
    key = jax.random.PRNGKey(0)
    xr = jax.random.uniform(key, (B, n), jnp.float32, -0.5, 0.5)
    xi = jax.random.uniform(jax.random.PRNGKey(1), (B, n), jnp.float32,
                            -0.5, 0.5)
    s = jnp.float32(1.0)

    def f_ext():
        out = PC.fft_planar(xr, xi, n, scale=s)
        float(force(out[0]))
    ms = device_time_ms(f_ext, reps=5, match=r"^jit_run")
    ext = B / (ms * 1e-3) / 1e6
    print(f"external(matmul): {ext:6.2f} MFFT/s")

    def f_mat():
        out = PC.fft_planar(xr, xi, n, scale=s, multiple_iters=ITERS)
        float(force(out[0]))
    ms = device_time_ms(f_mat, reps=5, match=r"^jit_run")
    print(f"multiple(matmul): {B * ITERS / (ms * 1e-3) / 1e6:6.2f} MFFT/s")

    for sb in (8, 16):
        try:
            def f_rf():
                out = RF.fft_rowfour_planar(xr, xi, multiple_iters=ITERS,
                                            sb=sb)
                float(force(out[0]))
            ms = device_time_ms(f_rf, reps=5, match=r"^jit_run")
            mf = B * ITERS / (ms * 1e-3) / 1e6
            print(f"multiple(rowfour sb={sb}): {mf:6.2f} MFFT/s "
                  f"({mf / ext:.2f}x external)")
        except Exception as e:  # noqa: BLE001
            print(f"rowfour sb={sb} FAILED: {str(e)[:140]}")
