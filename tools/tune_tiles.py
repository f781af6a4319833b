#!/usr/bin/env python
"""Batch-tile sweep for the ordered and unordered C2C paths (real TPU).

Usage: python tools/tune_tiles.py [sizes...]
"""

import sys
import time

sys.path.insert(0, ".")

SMALL_MB, BIG_MB = 16, 1024
CAP = 980.0


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC

    sizes = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 2048, 4096]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def t_once(f, reps=7):
        out = f()
        float(force(out[0]))
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = f()
            float(force(out[0]))
            vals.append(time.perf_counter() - t0)
        vals.sort()
        return vals[len(vals) // 2]

    def diff_gbs(make_f, ncols):
        best = 0.0
        for _ in range(4):
            ts = []
            for mb in (SMALL_MB, BIG_MB):
                rows = (mb * 2 ** 20) // (ncols * 4)
                rows = 1 << (rows.bit_length() - 1)
                ts.append((rows, t_once(make_f(rows))))
            (r0, t0), (r1, t1) = ts
            if t1 - t0 <= 5e-4:
                continue
            gbs = (r1 - r0) * ncols * 16 / (t1 - t0) / 1e9
            if gbs > CAP:
                continue
            best = max(best, gbs)
            if best:
                break
        return best

    for n in sizes:
        ncols = max(n, 128)
        for ordered in (False, True):
            for tile in (128, 256, 512, 1024):
                if tile * ncols * 4 > 24 * 2 ** 20:  # skip absurd frames
                    continue

                def mk(rows, _t=tile, _o=ordered):
                    vr = devdata(rows, ncols, 11)
                    vi = devdata(rows, ncols, 12)
                    s = jnp.float32(1.0)
                    return lambda: PC.fft_planar(
                        vr, vi, n, scale=s, ordered=_o, tile_t=_t)
                tag = "ordered" if ordered else "unord  "
                try:
                    gbs = diff_gbs(mk, ncols)
                    print(f"n={n:5d} {tag} tile={tile:4d}: {gbs:6.1f} GB/s",
                          flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n:5d} {tag} tile={tile:4d}: FAILED "
                          f"{str(e)[:80]}", flush=True)


if __name__ == "__main__":
    main()
