#!/usr/bin/env python
"""Ordered-path tuning probe (real TPU).

Times the ordered C2C kernel under merge-implementation variants, tile
sizes, and ablations to locate where the natural-order relayout spends
its time (VERDICT r1 item 2).  Output: GB/s per (size, variant, tile)
via the same single-dispatch differencing bench.py uses.

Usage: python tools/tune_ordered.py [sizes...]
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

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
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

    results = {}
    for n in sizes:
        ncols = max(n, 128)
        cases = [
            ("unordered", "swap", None),
            ("ordered/swap", "swap", None),
            ("ordered/swap t64", "swap", 64),
            ("ordered/swap t128", "swap", 128),
            ("ordered/swap t256", "swap", 256),
            ("ordered/concat_probe", "concat_probe", None),
            ("ordered/nostack_probe", "nostack_probe", 128),
            ("ordered/mxu_small", "mxu_small", None),
        ]
        for label, merge, tile in cases:
            PC._MERGE = merge
            PC._build.cache_clear()
            ordered = not label.startswith("unordered")

            def mk(rows, _tile=tile, _ord=ordered):
                vr = devdata(rows, ncols, 11)
                vi = devdata(rows, ncols, 12)
                s = jnp.float32(1.0)
                return lambda: PC.fft_planar(
                    vr, vi, n, scale=s, ordered=_ord, tile_t=_tile)
            try:
                gbs = diff_gbs(mk, ncols)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:5d} {label:24s} FAILED: {str(e)[:90]}",
                      flush=True)
                continue
            results[(n, label)] = gbs
            print(f"n={n:5d} {label:24s} {gbs:6.1f} GB/s", flush=True)
        PC._MERGE = "swap"
        PC._build.cache_clear()

    print("\nsummary:")
    for (n, label), gbs in sorted(results.items()):
        print(f"  n={n:5d} {label:24s} {gbs:6.1f}")


if __name__ == "__main__":
    main()
