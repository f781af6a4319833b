"""16384 tail probes: (a) rowfour sb sweep (can bigger blocks hide the
compute under the stream?), (b) accuracy of pencil vs matmul paths at
1024..4096 (candidate "exact" tier).

Usage: probe_16384.py [sb|acc]
"""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from smfft_tpu.utils.prof_timing import device_time_ms
from smfft_tpu.ops import pallas_c2c as PC
from smfft_tpu.ops import rowfour as RF

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))


def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()


def sb_sweep():
    n = 16384
    B = 512
    xr, xi = data(B, n, 1), data(B, n, 2)
    nbytes = B * n * 16
    s = jnp.float32(1.0)

    def f_ord():
        out = PC.fft_planar(xr, xi, n, scale=s, ordered=True)
        float(force(out[0]))
    ms = device_time_ms(f_ord, reps=5, match=r"^jit_run")
    print(f"ordered(matmul): {nbytes / ms / 1e6:5.0f} GB/s")
    for sb in (8, 16, 32, 64):
        try:
            def f_rf():
                out = RF.fft_rowfour_planar(xr, xi, sb=sb)
                float(force(out[0]))
            ms = device_time_ms(f_rf, reps=5, match=r"^jit_run")
            print(f"rowfour sb={sb}: {nbytes / ms / 1e6:5.0f} GB/s")
        except Exception as e:  # noqa: BLE001
            print(f"rowfour sb={sb} FAILED: {str(e)[:120]}")


def acc():
    from smfft_tpu.ops import pencil as PEN
    rng = np.random.default_rng(0)
    for n in (1024, 2048, 4096):
        c = n // 128
        x = (rng.random((256, n)) + 1j * rng.random((256, n))
             - 0.5 - 0.5j).astype(np.complex64)
        vr = jnp.array(np.ascontiguousarray(x.real))
        vi = jnp.array(np.ascontiguousarray(x.imag))
        ref = np.fft.fft(x.astype(np.complex128))
        o_r, o_i = PC.fft_planar(vr, vi, n, precision="highest")
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(-1, n)
        print(f"n={n} matmul[highest]: {np.max(np.abs(got - ref)):.3e}")
        o_r, o_i = PC.fft_planar(vr, vi, n, precision="highest",
                                 ordered=True)
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        print(f"n={n} ordered[highest]: {np.max(np.abs(got - ref)):.3e}")
        try:
            o_r, o_i = PEN.fft_pencil_planar(vr, vi, n)
            got = np.asarray(o_r) + 1j * np.asarray(o_i)
            print(f"n={n} pencil: {np.max(np.abs(got - ref)):.3e}")
        except Exception as e:  # noqa: BLE001
            print(f"n={n} pencil FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "sb"
    (sb_sweep if mode == "sb" else acc)()
