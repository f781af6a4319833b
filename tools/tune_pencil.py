#!/usr/bin/env python
"""Prototype: pencil-layout in-VMEM multiple (NREUSES) kernel.

Loads a (1024, n) block of row-FFTs, relayouts ONCE into pencil form
big (8n, 128) where plane j = rows [8j, 8j+8) holds sample j of
8*128 = 1024 independent FFTs, then runs `iters` full FFTs as the pure
VPU radix-4 plane ladder (scalar twiddles, no MXU, no per-iteration
relayout), and relayouts back.  Correctness vs numpy + device timing.

Usage: python tools/tune_pencil.py [n ...]
"""

import sys

sys.path.insert(0, ".")


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smfft_tpu.ops.pallas_c2c import _plane_dft_list
    from smfft_tpu.utils.prof_timing import device_time_ms

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))
    R = 1024

    def build(n, iters):
        scale = np.float32(1.0 / np.sqrt(float(n)))

        def kernel(xr_ref, xi_ref, our_ref, oui_ref):
            def to_pencil(x):
                slabs = [jnp.transpose(x[r * 128:(r + 1) * 128, :])
                         for r in range(8)]
                return jnp.stack(slabs, axis=1).reshape(8 * n, 128)
            br = to_pencil(xr_ref[:])
            bi = to_pencil(xi_ref[:])

            def body(_, carry):
                cr, ci = carry
                pr = [cr[8 * j:8 * (j + 1)] for j in range(n)]
                pi = [ci[8 * j:8 * (j + 1)] for j in range(n)]
                o_r, o_i = _plane_dft_list(pr, pi, -1.0)
                return (jnp.concatenate(o_r, axis=0) * scale,
                        jnp.concatenate(o_i, axis=0) * scale)
            br, bi = jax.lax.fori_loop(0, iters, body, (br, bi))

            def from_pencil(b):
                b3 = b.reshape(n, 8, 128)
                return jnp.concatenate(
                    [jnp.transpose(b3[:, r, :]) for r in range(8)], axis=0)
            our_ref[:] = from_pencil(br)
            oui_ref[:] = from_pencil(bi)

        spec = pl.BlockSpec((R, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        @jax.jit
        def run(vr, vi):
            b = vr.shape[0]
            return pl.pallas_call(
                kernel, grid=(b // R,),
                in_specs=[spec, spec], out_specs=(spec, spec),
                out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=110 * 1024 * 1024,
                    dimension_semantics=("arbitrary",)),
            )(vr, vi)
        return run

    sizes = [int(a) for a in sys.argv[1:]] or [256, 1024]
    for n in sizes:
        # correctness: 1 iteration vs numpy (output scaled by 1/sqrt(n))
        rng = np.random.default_rng(0)
        x = (rng.random((R, n)) + 1j * rng.random((R, n))
             - .5 - .5j).astype(np.complex64)
        try:
            run1 = build(n, 1)
            o_r, o_i = run1(jnp.array(x.real.copy()),
                            jnp.array(x.imag.copy()))
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
            run100 = build(n, 100)

            def f():
                out = run100(vr, vi)
                float(force(out[0]))
            ms = device_time_ms(f, reps=3, match=r"^jit_run")
            mffts = rows * 100 / (ms * 1e-3) / 1e6
            print(f"n={n} pencil multiple x100: {ms:8.3f} ms  "
                  f"{mffts:7.1f} MFFT/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"n={n} pencil perf FAILED {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
