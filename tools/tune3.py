#!/usr/bin/env python
"""Device-timed roofline, ablations, and merge variants.

Usage: python tools/tune3.py [sizes...]
"""

import sys

sys.path.insert(0, ".")

PLANE_MB = 512


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.utils.prof_timing import device_time_ms

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    # --- rooflines ---------------------------------------------------
    rows = (PLANE_MB * 2 ** 20) // (2048 * 4)
    a = devdata(rows, 2048, 1)
    b = devdata(rows, 2048, 2)
    nb2 = rows * 2048 * 4

    @jax.jit
    def scale2(x, y):
        return x * jnp.float32(1.01), y * jnp.float32(1.01)

    def f_scale():
        out = scale2(a, b)
        float(force(out[0]))
    ms = device_time_ms(f_scale, reps=5, match=r"^jit_scale2")
    print(f"roofline scale2 (2 planes r+w, {4*nb2/1e9:.2f} GB): "
          f"{ms:7.3f} ms  {4*nb2/ms/1e6:6.1f} GB/s", flush=True)

    # pallas copy kernel, same block structure as the FFT
    def copyk(xr, xi, our, oui):
        our[:] = xr[:]
        oui[:] = xi[:]
    spec = pl.BlockSpec((256, 2048), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)

    @jax.jit
    def pcopy(x, y):
        return pl.pallas_call(
            copyk, grid=(rows // 256,),
            in_specs=[spec, spec], out_specs=(spec, spec),
            out_shape=(jax.ShapeDtypeStruct((rows, 2048), jnp.float32),) * 2,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
                dimension_semantics=("parallel",)),
        )(x, y)

    def f_pcopy():
        out = pcopy(a, b)
        float(force(out[0]))
    ms = device_time_ms(f_pcopy, reps=5, match=r"^jit_pcopy")
    print(f"roofline pallas copy (2 planes r+w): "
          f"{ms:7.3f} ms  {4*nb2/ms/1e6:6.1f} GB/s", flush=True)

    # --- ablations + merge variants ----------------------------------
    for n in sizes:
        ncols = max(n, 128)
        rows_n = 1 << (((PLANE_MB * 2 ** 20) // (ncols * 4)).bit_length()
                       - 1)
        vr = devdata(rows_n, ncols, 11)
        vi = devdata(rows_n, ncols, 12)
        nbytes = 4 * rows_n * ncols * 4
        s = jnp.float32(1.0)

        def run_case(label, ablate="", merge=PC._MERGE, ordered=False,
                     tile=256, precision="highest"):
            PC._ABLATE = ablate
            PC._MERGE = merge
            PC._build.cache_clear()

            def fsync():
                out = PC.fft_planar(vr, vi, n, ordered=ordered,
                                    tile_t=tile, scale=s,
                                    precision=precision)
                float(force(out[0]))
            try:
                ms = device_time_ms(fsync, reps=5, match=r"^jit_run")
                print(f"n={n:5d} {label:26s} {ms:7.3f} ms  "
                      f"{nbytes/ms/1e6:6.1f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:5d} {label:26s} FAILED {str(e)[:70]}",
                      flush=True)
            finally:
                PC._ABLATE = ""
                PC._MERGE = "tdot_rows"  # the product default

        run_case("copy_only", ablate="copy_only")
        run_case("no_matmul (plane+twid)", ablate="no_matmul")
        run_case("no_plane (twid+mm)", ablate="no_plane")
        run_case("no_twiddle (plane+mm)", ablate="no_twiddle")
        run_case("full unordered")
        run_case("full unordered fast", precision="fast")
        run_case("ordered/tdot_rows t128", ordered=True, tile=128)
        run_case("ordered/tdot_rows t256", ordered=True, tile=256)
        run_case("ordered/tdot_late t256", merge="tdot_late",
                 ordered=True, tile=256)
        run_case("ordered/swap t256", merge="swap",
                 ordered=True, tile=256)
    PC._build.cache_clear()


if __name__ == "__main__":
    main()
