"""Dump per-program device durations for the combined fused four-step."""
import sys
sys.path.insert(0, ".")
import tempfile
import numpy as np
import jax
import jax.numpy as jnp
from smfft_tpu.ops import fourstep_fused as FF
from smfft_tpu.utils import prof_timing as PT

n = 1 << 20
B = 24
force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
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

f()
with tempfile.TemporaryDirectory() as td:
    with jax.profiler.trace(td):
        for _ in range(3):
            f()
    durs = PT._parse_device_events(td)
for name, ds in sorted(durs.items(), key=lambda kv: -sum(kv[1])):
    ds = sorted(ds)
    print(f"{sum(ds)/3/1e3:9.3f} ms/rep x? n={len(ds)}  {name[:90]}")
