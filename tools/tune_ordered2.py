#!/usr/bin/env python
"""Device-timed stage ablation of the ordered (tdot_late) path.

Variants per size (tuned tile):
  unordered  — kernel A unordered (the 656 GB/s floor)
  ordered    — full tdot_late (product path)
  norecon    — dots + pack(interleave) + wide transpose, skip _late_recon
               (WRONG RESULT; isolates the mirror-recon cost)
  nostack    — dots + plain concat + wide transpose (WRONG RESULT;
               isolates the sublane-interleave cost vs concat)

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

    sizes = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048, 4096]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    real_late = PC._late_recon

    def norecon(qr, qi, c):
        return qr, qi

    def run_variant(n, variant, vr, vi, nbytes):
        PC._build.cache_clear()
        if variant == "norecon":
            PC._late_recon = norecon
        else:
            PC._late_recon = real_late
        if variant == "nostack":
            orig_pack = PC._emit_ordered_tdot_late

            def nostack_emit(pre, pim, consts, precision):
                c = len(pre)
                m = consts[2]
                ms = (consts[3], consts[4]) if len(consts) > 3 else None
                zq_r = [PC._dot_t(m, pre[k], precision, ms)
                        for k in range(c)]
                zq_i = [PC._dot_t(m, pim[k], precision, ms)
                        for k in range(c)]
                qr = jnp.transpose(jnp.concatenate(zq_r, axis=0))
                qi = jnp.transpose(jnp.concatenate(zq_i, axis=0))
                return qr, qi
            PC._emit_ordered_tdot_late = nostack_emit
        try:
            ordered = variant != "unordered"

            def fsync():
                out = PC.fft_planar(vr, vi, n, ordered=ordered,
                                    precision="highest")
                float(force(out[0]))
            ms = device_time_ms(fsync, reps=5, match=r"^jit_run")
            return nbytes / ms / 1e6
        finally:
            PC._late_recon = real_late
            if variant == "nostack":
                PC._emit_ordered_tdot_late = orig_pack
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
