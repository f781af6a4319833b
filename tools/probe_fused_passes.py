"""Per-pass device timing + tile sweep for the fused four-step."""
import sys
sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

from smfft_tpu.ops import fourstep_fused as FF
from smfft_tpu.utils.prof_timing import device_time_ms

def main():
    e = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << e
    n1, n2 = FF.split_factors(n, 128)
    B = max(1, (192 << 20) // (8 * n))
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
    xr = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(1), (B * n1, n2), jnp.float32, -0.5, 0.5))()
    xi = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(2), (B * n1, n2), jnp.float32, -0.5, 0.5))()
    br = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(3), (B * n2, n1), jnp.float32, -0.5, 0.5))()
    bi = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(4), (B * n2, n1), jnp.float32, -0.5, 0.5))()
    tw = tuple(jnp.asarray(t) for t in FF._twiddle_split_tables(
        n, n1, n2, False, 1.0))
    nbytes = B * n * 8 * 2   # per-pass in+out planar bytes

    for t2 in (128, 256, 512, 1024, 2048):
        if t2 > n2 or n2 % t2:
            continue
        try:
            run1 = FF._build_pass1(n, n1, n2, t2, False, "highest")
            def f():
                o = run1(xr, xi, *tw)
                float(force(o[0]))
            ms = device_time_ms(f, reps=5, match=r"^jit_run")
            print(f"pass1 t2={t2:5d}: {ms:8.3f} ms  {nbytes/ms/1e6:6.1f} GB/s")
        except Exception as ex:
            print(f"pass1 t2={t2}: FAILED {str(ex)[:150]}")
    for t1 in (128, 256, 512, 1024, 2048):
        if t1 > n1 or n1 % t1:
            continue
        try:
            run2 = FF._build_pass2(n, n1, n2, t1, False, "highest")
            def g():
                o = run2(br, bi)
                float(force(o[0]))
            ms = device_time_ms(g, reps=5, match=r"^jit_run")
            print(f"pass2 t1={t1:5d}: {ms:8.3f} ms  {nbytes/ms/1e6:6.1f} GB/s")
        except Exception as ex:
            print(f"pass2 t1={t1}: FAILED {str(ex)[:150]}")

if __name__ == "__main__":
    main()
