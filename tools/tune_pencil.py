#!/usr/bin/env python
"""Pencil-layout kernel probe: correctness vs numpy + device timing of
the PRODUCT multiple (NREUSES) path at each size, via ops/pencil.py
(no inline re-implementation — the tool measures exactly what ships,
including the 512-row blocks at n = 4096).

Usage: python tools/tune_pencil.py [n ...]
"""

import sys

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pencil
    from smfft_tpu.utils.prof_timing import device_time_ms

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    sizes = [int(a) for a in sys.argv[1:]] or [256, 1024, 4096]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    for n in sizes:
        rb = pencil._r_block(n)
        # correctness: 1 iteration vs numpy (output scaled by 1/sqrt(n))
        rng = np.random.default_rng(0)
        x = (rng.random((rb, n)) + 1j * rng.random((rb, n))
             - .5 - .5j).astype(np.complex64)
        try:
            o_r, o_i = pencil.multiple_pencil_planar(
                jnp.array(x.real.copy()), jnp.array(x.imag.copy()),
                n, iters=1)
            got = (np.asarray(o_r) + 1j * np.asarray(o_i)) * np.sqrt(n)
            ref = np.fft.fft(x.astype(np.complex128))
            print(f"n={n} pencil 1-iter err: "
                  f"{np.max(np.abs(got - ref)):.3e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"n={n} pencil correctness FAILED {str(e)[:120]}",
                  flush=True)
            continue
        # perf: iters=100, modest HBM batch
        rows = 8192
        vr = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(1), (rows, n), jnp.float32))()
        vi = jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(2), (rows, n), jnp.float32))()
        try:
            def f():
                out = pencil.multiple_pencil_planar(vr, vi, n, iters=100)
                float(force(out[0]))
            ms = device_time_ms(f, reps=3, match=r"^jit_run")
            mffts = rows * 100 / (ms * 1e-3) / 1e6
            print(f"n={n} pencil multiple x100: {ms:8.3f} ms  "
                  f"{mffts:7.1f} MFFT/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"n={n} pencil perf FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
