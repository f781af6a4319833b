#!/usr/bin/env python
"""Device-timed sweep of the direct real kernels (ops/real_direct.py)
vs the shipping natural-order real paths, n = 1024..16384.

Usage: python tools/tune_real_direct.py [sizes...]
Prints GB/s (8 bytes per real sample in+out) per (kernel, tile).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_real as PR
    from smfft_tpu.ops import real_direct as RD
    from smfft_tpu.utils.prof_timing import device_time_ms

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096, 8192,
                                               16384]
    plane_mb = 512
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    for n in sizes:
        rows = 1 << (((plane_mb * 2 ** 20) // (n * 4)).bit_length() - 1)
        x = devdata(rows, n, n)
        hr = devdata(rows, n // 2, n + 1)
        hi = devdata(rows, n // 2, n + 2)
        nbytes = rows * n * 8

        def probe(label, fsync):
            try:
                ms = device_time_ms(fsync, reps=5)
                print(f"n={n:6d} {label:28s} {nbytes/ms/1e6:6.1f} GB/s"
                      f"  ({ms:.3f} ms)", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:6d} {label:28s} FAILED {str(e)[:90]}",
                      flush=True)

        for tile in (512, 256, 128, 64):
            if 2 * tile > rows:
                continue

            def f_r2cp(t=tile):
                o = RD.rfft_pair_planar(x, tile_t=t)
                float(force(o[0]))
            probe(f"r2c pair tile={tile}", f_r2cp)

            def f_c2rp(t=tile):
                o = RD.irfft_pair_planar(hr, hi, n, tile_t=t)
                float(force(o))
            probe(f"c2r pair tile={tile}", f_c2rp)

        # shipping paths for comparison
        if n <= 4096:
            def f_r2c_old():
                o = PR.rfft_fused_planar(x, ordered=True)
                float(force(o[0]))
            probe("r2c shipping (pencil)", f_r2c_old)

            def f_c2r_old():
                o = PR.irfft_fused_planar(hr, hi, n, in_natural=True)
                float(force(o))
            probe("c2r shipping (pencil)", f_c2r_old)
        else:
            def f_r2c_old():
                o = PR.rfft_fused_planar(x, ordered=True)
                float(force(o[0]))
            probe("r2c shipping (matmul+swap)", f_r2c_old)

            def f_c2r_old():
                o = PR.irfft_fused_planar(hr, hi, n, in_natural=True)
                float(force(o))
            probe("c2r shipping (matmul+swap)", f_c2r_old)


if __name__ == "__main__":
    main()
