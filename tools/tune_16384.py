#!/usr/bin/env python
"""Device sweep for the extended n=16384 size: external + ordered tiles
and ordered merge variants (tdot_rows vs the c-independent digit-swap
fallback vs tdot_late), plus the fused-convolution tile at n=1024.

Current shipped numbers (v5e): external 594 (tile 64), ordered 467
(tile 128, tdot_rows).  At c=128 the tdot_rows stride-c interleave may
lose to the digit-swap merge whose relayout cost is c-independent.
"""

import sys

sys.path.insert(0, ".")

PLANE_MB = 512


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.utils.prof_timing import device_time_ms

    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    n = 16384
    rows = (PLANE_MB * 2 ** 20) // (n * 4)
    rows = 1 << (rows.bit_length() - 1)
    vr = devdata(rows, n, 11)
    vi = devdata(rows, n, 12)
    nbytes = 4 * rows * n * 4
    s = jnp.float32(1.0)

    def row(tag, fsync):
        try:
            ms = device_time_ms(fsync, reps=5, match=r"^jit_run")
            print(f"{tag}: {ms:7.3f} ms  {nbytes / ms / 1e6:6.1f} GB/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {str(e)[:90]}", flush=True)

    for tile in (32, 64, 128):
        def f(_t=tile):
            out = PC.fft_planar(vr, vi, n, tile_t=_t, scale=s)
            float(force(out[0]))
        row(f"n=16384 unord   tile={tile:4d}", f)

    for merge in ("tdot_rows", "digit_swap", "tdot_late"):
        for tile in (32, 64, 128, 256):
            def f(_t=tile, _m=merge):
                old = PC._MERGE
                PC._MERGE = _m
                try:
                    out = PC.fft_planar(vr, vi, n, tile_t=_t, scale=s,
                                        ordered=True)
                    float(force(out[0]))
                finally:
                    PC._MERGE = old
            PC._build.cache_clear()
            row(f"n=16384 ord[{merge:10s}] tile={tile:4d}", f)
        PC._build.cache_clear()

    # fused convolution tile sweep at n=1024
    from smfft_tpu.ops import convolve as CV
    n2 = 1024
    rows2 = 1 << ((((PLANE_MB * 2 ** 20) // (n2 * 4)).bit_length()) - 1)
    wr = devdata(rows2, n2, 21)
    wi = devdata(rows2, n2, 22)
    hr = devdata(1, n2, 23)[0]
    hi = devdata(1, n2, 24)[0]
    nbytes2 = 4 * rows2 * n2 * 4
    for tile in (128, 256, 512):
        def f(_t=tile):
            out = CV.convolve_planar(wr, wi, hr, hi, n2, tile_t=_t)
            float(force(out[0]))
        try:
            ms = device_time_ms(f, reps=5, match=r"^jit_run")
            print(f"conv n=1024 tile={tile:4d}: {ms:7.3f} ms  "
                  f"{nbytes2 / ms / 1e6:6.1f} GB/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"conv n=1024 tile={tile:4d}: FAILED {str(e)[:90]}",
                  flush=True)


if __name__ == "__main__":
    main()
