#!/usr/bin/env python
"""Cross-validate the chip's achievable HBM stream roofline with
independent methods (VERDICT r2 next #7: the whole "~100% of
achievable" story rests on one self-measured 656 GB/s figure).

Methods (all device-side profiler timing, in+out traffic):
  1. XLA scale:      y = 1.01 * x, fp32, 512 MB and 1 GB working sets
  2. XLA copy:       y = x + 0  (pure copy through XLA)
  3. int8 rows:      y = x ^ 1  on int8 (dtype-independent byte rate)
  4. Pallas DMA:     out_ref[:] = in_ref[:] at several tile sizes
  5. bf16 scale:     half-width elements, same byte traffic

Prints one line per method; records the max as the achievable roofline.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import json


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smfft_tpu.utils.prof_timing import device_time_ms

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8]
                                              ).astype(jnp.float32)))
    results = {}

    def probe(label, fsync, nbytes, match=r"^jit_"):
        try:
            ms = device_time_ms(fsync, reps=5, match=match)
            gbs = nbytes / ms / 1e6
            results[label] = round(gbs, 1)
            print(f"{label:32s} {gbs:6.1f} GB/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:32s} FAILED {str(e)[:90]}", flush=True)

    def devdata(rows, cols, dtype=jnp.float32, seed=1):
        if dtype == jnp.int8:
            return jax.jit(lambda: jax.random.randint(
                jax.random.PRNGKey(seed), (rows, cols), 0, 127,
                jnp.int8))()
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), dtype))()

    # 1/2. XLA scale + copy at two working-set sizes
    for mb in (512, 1024):
        rows = (mb * 2 ** 20) // (2048 * 4)
        a = devdata(rows, 2048)

        @jax.jit
        def run_scale(x):
            return x * jnp.float32(1.01)

        @jax.jit
        def run_copyadd(x):
            return x + jnp.float32(0.0)

        nbytes = 2 * rows * 2048 * 4
        probe(f"xla scale fp32 {mb}MB",
              lambda: float(force(run_scale(a))), nbytes,
              r"^jit_run_scale")
        probe(f"xla copy(+0) fp32 {mb}MB",
              lambda: float(force(run_copyadd(a))), nbytes,
              r"^jit_run_copyadd")

    # 3. int8 byte rate (same byte count, 4x the elements per byte lane)
    rows8 = (512 * 2 ** 20) // 2048
    b8 = devdata(rows8, 2048, jnp.int8)

    @jax.jit
    def run_int8(x):
        return x ^ jnp.int8(1)

    probe("xla xor int8 512MB",
          lambda: float(force(run_int8(b8))), 2 * rows8 * 2048,
          r"^jit_run_int8")

    # 4. Pallas DMA-only copy at several tiles
    rowsp = (512 * 2 ** 20) // (2048 * 4)
    ap = devdata(rowsp, 2048)
    for tile in (256, 512, 1024):
        def kernel(x_ref, o_ref):
            o_ref[:] = x_ref[:]
        spec = pl.BlockSpec((tile, 2048), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

        @jax.jit
        def run_pallas(x, t=tile, sp=spec):
            return pl.pallas_call(
                kernel, grid=(rowsp // t,), in_specs=[sp], out_specs=sp,
                out_shape=jax.ShapeDtypeStruct((rowsp, 2048),
                                               jnp.float32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("parallel",)),
            )(x)

        probe(f"pallas dma copy tile={tile}",
              lambda: float(force(run_pallas(ap))), 2 * rowsp * 2048 * 4,
              r"^jit_run_pallas")

    # 5. bf16 scale (half-width elements, same bytes)
    rowsb = (512 * 2 ** 20) // (2048 * 2)
    ab = jax.jit(lambda: jax.random.uniform(
        jax.random.PRNGKey(3), (rowsb, 2048), jnp.float32
    ).astype(jnp.bfloat16))()

    @jax.jit
    def run_bf16(x):
        return x * jnp.bfloat16(1.01)

    probe("xla scale bf16 512MB",
          lambda: float(force(run_bf16(ab))), 2 * rowsb * 2048 * 2,
          r"^jit_run_bf16")

    best = max(results.values()) if results else None
    print(json.dumps({"methods": results, "achievable_max": best}))


if __name__ == "__main__":
    main()
