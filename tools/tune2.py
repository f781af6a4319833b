#!/usr/bin/env python
"""Definitive tile/variant sweep using device-side profiler timing.

Usage: python tools/tune2.py [sizes...]
"""

import sys

sys.path.insert(0, ".")

PLANE_MB = 512


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.utils.prof_timing import device_time_ms

    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 4096]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    for n in sizes:
        ncols = max(n, 128)
        rows = (PLANE_MB * 2 ** 20) // (ncols * 4)
        rows = 1 << (rows.bit_length() - 1)
        vr = devdata(rows, ncols, 11)
        vi = devdata(rows, ncols, 12)
        nbytes = 4 * rows * ncols * 4  # 2 planes in + 2 planes out
        s = jnp.float32(1.0)
        for ordered in (False, True):
            for tile in (64, 128, 256, 512):
                def fsync(_t=tile, _o=ordered):
                    out = PC.fft_planar(vr, vi, n, ordered=_o, tile_t=_t,
                                        scale=s)
                    float(force(out[0]))
                tag = "ordered" if ordered else "unord  "
                try:
                    ms = device_time_ms(fsync, reps=5, match=r"^jit_run")
                    gbs = nbytes / ms / 1e6
                    print(f"n={n:5d} {tag} tile={tile:4d}: {ms:7.3f} ms  "
                          f"{gbs:6.1f} GB/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n:5d} {tag} tile={tile:4d}: FAILED "
                          f"{str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
