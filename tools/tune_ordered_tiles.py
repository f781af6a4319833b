#!/usr/bin/env python
"""Device-timed tile sweep of the ordered (tdot_rows) c2c path —
VERDICT r2 next #5: close the 1024/2048/8192 dips (617/621/599 vs 656).

Usage: python tools/tune_ordered_tiles.py [sizes...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

PLANE_MB = 512


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.utils.prof_timing import device_time_ms

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192]
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    for n in sizes:
        rows = 1 << (((PLANE_MB * 2 ** 20) // (n * 4)).bit_length() - 1)
        vr = devdata(rows, n, 2 * n)
        vi = devdata(rows, n, 2 * n + 1)
        nbytes = 4 * rows * n * 4
        for tile in (1024, 512, 256, 128, 64):
            if tile > rows:
                continue

            def fsync(t=tile):
                o = PC.fft_planar(vr, vi, n, ordered=True, tile_t=t)
                float(force(o[0]))
            try:
                ms = device_time_ms(fsync, reps=5)
                print(f"n={n:6d} ordered tile={tile:5d} "
                      f"{nbytes/ms/1e6:6.1f} GB/s ({ms:.3f} ms)",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:6d} ordered tile={tile:5d} FAILED "
                      f"{str(e)[:90]}", flush=True)


if __name__ == "__main__":
    main()
