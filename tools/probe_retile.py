"""Measure TPU retile cost of minor-dim-changing reshapes + current
fft_large dispatch vs jnp.fft at 2**15..2**24."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from smfft_tpu.utils.prof_timing import device_time_ms
from smfft_tpu.ops import fourstep_fused as FF
from smfft_tpu.ops.fourstep import split_factors

force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

def data(b, n, seed):
    return jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(seed), (b, n), jnp.float32, -0.5, 0.5))()

# --- bare retile costs at 2^20 ---
n = 1 << 20
B = 24
n1, n2 = split_factors(n, 128)
x = data(B, n, 1)
y = data(B * n2, n1, 2)

@jax.jit
def resh_in(a):
    return a.reshape(B * n1, n2) * 1.0   # force materialization

@jax.jit
def resh_out(a):
    return a.reshape(B, n) * 1.0

for name, fn, arr in (("in  (B,n)->(B*n1,n2)", resh_in, x),
                      ("out (B*n2,n1)->(B,n)", resh_out, y)):
    def f():
        float(force(fn(arr)))
    ms = device_time_ms(f, reps=5, match=r"^jit_resh")
    gbs = arr.nbytes * 2 / ms / 1e6
    print(f"retile {name}: {ms:7.3f} ms  {gbs:6.1f} GB/s")

# --- dispatch sweep vs jnp ---
print()
for e in range(15, 25):
    n = 1 << e
    Bb = max(2, min(64, (256 << 20) // (8 * n)))
    xr = data(Bb, n, 3)
    xi = data(Bb, n, 4)

    @jax.jit
    def run(p, q):
        return FF.dispatch_planar(p, q)

    @jax.jit
    def run_jnp(p, q):
        z = jnp.fft.fft(jax.lax.complex(p, q))
        return jnp.real(z), jnp.imag(z)

    nbytes = Bb * n * 16
    try:
        def f():
            o = run(xr, xi)
            float(force(o[0]))
        ms = device_time_ms(f, reps=5, match=r"^jit_run\(")
        gbs = nbytes / ms / 1e6
    except Exception as ex:
        print(f"2^{e}: dispatch FAILED {str(ex)[:120]}")
        continue
    def g():
        o = run_jnp(xr, xi)
        float(force(o[0]))
    msj = device_time_ms(g, reps=5, match=r"^jit_run_jnp")
    gbsj = nbytes / msj / 1e6
    print(f"2^{e:2d} B={Bb:3d}: fused {gbs:6.1f} GB/s ({ms:7.3f} ms)  "
          f"jnp {gbsj:6.1f} GB/s  ratio {gbs/gbsj:4.2f}x")
