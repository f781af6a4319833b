#!/usr/bin/env python
"""Device-timed stage ablation of the ordered (tdot_rows) product path.

Variants per size (tuned tile):
  unordered  — kernel A unordered (the ~656 GB/s floor)
  ordered    — full tdot_rows (product path)
  norecon    — dots + pack (sublane interleave) + wide transpose, skip
               the row-domain mirror recon (WRONG RESULT; isolates the
               recon's slice/add cost)
  nostack    — dots + plain concat + wide transpose (WRONG RESULT;
               isolates the sublane-interleave cost vs concat)

Historical v5e results (when the lane-domain tdot_late was the
product): unordered 656 / ordered 487-537 / norecon 537-648 /
nostack 563-658 — the lane-gather recon was the entire gap, which is
what motivated the row-domain tdot_rows recon.

Usage: python tools/tune_ordered2.py [sizes...]
"""

import sys

sys.path.insert(0, ".")

PLANE_MB = 512


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.utils.prof_timing import device_time_ms

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    print(f"device: {jax.devices()[0].device_kind} "
          f"(merge={PC._MERGE})", flush=True)

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    real_recon = PC._rows_recon
    real_pack = PC._pack_rows

    def norecon(zq_r, zq_i):
        c = len(zq_r)
        return PC._pack_rows(zq_r, c), PC._pack_rows(zq_i, c)

    def nostack_pack(zs, c):
        return jnp.concatenate(zs, axis=0)  # WRONG row order (probe)

    def run_variant(n, variant, vr, vi, nbytes):
        PC._build.cache_clear()
        if variant == "norecon":
            PC._rows_recon = norecon
        elif variant == "nostack":
            PC._rows_recon = norecon
            PC._pack_rows = nostack_pack
        try:
            ordered = variant != "unordered"

            def fsync():
                out = PC.fft_planar(vr, vi, n, ordered=ordered,
                                    precision="highest")
                float(force(out[0]))
            ms = device_time_ms(fsync, reps=5, match=r"^jit_run")
            return nbytes / ms / 1e6
        finally:
            PC._rows_recon = real_recon
            PC._pack_rows = real_pack
            PC._build.cache_clear()

    for n in sizes:
        rows = 1 << ((PLANE_MB * 2 ** 20 // (n * 4)).bit_length() - 1)
        vr, vi = devdata(rows, n, 11), devdata(rows, n, 12)
        nbytes = 4 * rows * n * 4
        line = f"n={n:5d}"
        for variant in ("unordered", "ordered", "norecon", "nostack"):
            try:
                gbs = run_variant(n, variant, vr, vi, nbytes)
                line += f"  {variant}:{gbs:6.1f}"
            except Exception as e:  # noqa: BLE001
                line += f"  {variant}:FAIL({str(e)[:40]})"
        print(line, flush=True)


if __name__ == "__main__":
    main()
