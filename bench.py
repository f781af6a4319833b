#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Measures the "external" path (fresh HBM input per transform, one fused
kernel pass: the analogue of FFT_external_benchmark,
SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:583-664) across the reference's
size sweep, plus the in-VMEM "multiple" path (NREUSES=100 re-applications,
:666-752) and a correctness gate vs numpy.fft.

Metric: geometric-mean external-path throughput in GB/s (in+out traffic)
across N = 32..4096 C2C fp32.  vs_baseline compares against the
reference's published V100 external throughput (8 GB moved in ~10.45 ms
= 822 GB/s, README.md:84-91 / BASELINE.md) — the number a user switching
from the reference would compare.

Timing discipline (axon tunnel: block_until_ready unreliable, dispatch RTT
~ms, host<->device complex transfers unsupported): data is generated
on-device, k dispatches are chained through a device-side scalar derived
from the previous output (defeats dispatch dedup, forces serial
execution), timing differences two chain lengths to cancel fixed overhead,
and completion is forced by a scalar readback.  Details per size are
written to BENCH_DETAILS.json (stderr logs progress; stdout carries only
the JSON line).
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

SIZES = (32, 64, 128, 256, 512, 1024, 2048, 4096)
PLANE_MB = 128          # per-plane working set (conservative: the remote
                        # compiler 500s intermittently on multi-GB shapes)
MULT_ITERS = 100        # NREUSES (FFT-GPU-32bit.cu:10)
BASELINE_EXTERNAL_GBS = 822.0   # V100 reference, BASELINE.md


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC

    on_tpu = jax.default_backend() == "tpu"
    log(f"bench device: {jax.devices()[0].device_kind} "
        f"({jax.default_backend()})")

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    dep = jax.jit(lambda a: a[0, 0] * np.float32(1e-30) + np.float32(1.0))
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def run_chain(f, k):
        s = jnp.float32(1.0)
        t0 = time.perf_counter()
        o = None
        for _ in range(k):
            o = f(s)
            s = dep(o[0])
        _ = float(force(o[0]))
        return time.perf_counter() - t0

    def timed(f):
        _ = run_chain(f, 1)      # compile + warm
        _ = run_chain(f, 2)
        samples = []
        for _ in range(3):
            t2 = run_chain(f, 2)
            t6 = run_chain(f, 6)
            samples.append((t6 - t2) / 4)
        samples.sort()
        return samples[1]

    details = {"sizes": {}, "device": str(jax.devices()[0])}
    ext_gbs = []
    for n in SIZES:
        ncols = max(n, 128)
        rows = (PLANE_MB * 2 ** 20) // (ncols * 4)
        rows = 1 << (rows.bit_length() - 1)
        traffic = rows * ncols * 16          # re+im, read+write
        nffts = rows * ncols // n
        entry = {}
        try:
            vr = devdata(rows, ncols, 2 * n)
            vi = devdata(rows, ncols, 2 * n + 1)
            per = timed(lambda s: PC.fft_planar(vr, vi, n, scale=s))
            entry["external_ms"] = per * 1e3
            entry["external_gbs"] = traffic / per / 1e9
            entry["external_mffts"] = nffts / per / 1e6
            ext_gbs.append(entry["external_gbs"])
            log(f"n={n:5d} external: {per*1e3:8.3f} ms  "
                f"{entry['external_gbs']:6.1f} GB/s")
            per_h = timed(lambda s: PC.fft_planar(
                vr, vi, n, scale=s, precision="high"))
            entry["external_high_gbs"] = traffic / per_h / 1e9
            log(f"n={n:5d} external(high): {per_h*1e3:8.3f} ms  "
                f"{entry['external_high_gbs']:6.1f} GB/s")
            # multiple path: same rows, MULT_ITERS in-VMEM re-applications,
            # 1/MULT_ITERS of the data (reference grid=nFFTs/100 contract)
            rows_m = max(8, rows // MULT_ITERS)
            rows_m = 1 << (rows_m.bit_length() - 1)  # keep tiles large
            vr_m = devdata(rows_m, ncols, 4 * n)
            vi_m = devdata(rows_m, ncols, 4 * n + 1)
            per_m = timed(lambda s: PC.fft_planar(
                vr_m, vi_m, n, scale=s, multiple_iters=MULT_ITERS))
            ffts_m = rows_m * ncols // n * MULT_ITERS
            entry["multiple_ms"] = per_m * 1e3
            entry["multiple_mffts"] = ffts_m / per_m / 1e6
            log(f"n={n:5d} multiple: {per_m*1e3:8.3f} ms  "
                f"{entry['multiple_mffts']:8.2f} MFFT/s "
                f"({MULT_ITERS}x in-VMEM)")
        except Exception as e:  # noqa: BLE001 — record and continue
            entry["error"] = str(e)[:200]
            log(f"n={n:5d} FAILED: {str(e)[:120]}")
        details["sizes"][str(n)] = entry

    # correctness gate (small batch; pulls via planar transfer)
    rng = np.random.default_rng(0)
    n = 1024
    x = (rng.random((512, n)) + 1j * rng.random((512, n)) - 0.5 - 0.5j
         ).astype(np.complex64)
    vr = jnp.array(np.ascontiguousarray(x.real))
    vi = jnp.array(np.ascontiguousarray(x.imag))
    ref = np.fft.fft(x.astype(np.complex128))
    c = n // 128
    for prec in ("highest", "high", "default"):
        o_r, o_i = PC.fft_planar(vr, vi, n, precision=prec)
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(-1, n)
        err = float(np.max(np.abs(got - ref)))
        details[f"max_abs_err_n1024_{prec}"] = err
        log(f"correctness({prec}): max abs err vs numpy.fft (N=1024) "
            f"= {err:.3e}")

    value = float(np.exp(np.mean(np.log(ext_gbs)))) if ext_gbs else 0.0
    details["external_geomean_gbs"] = value
    with open("BENCH_DETAILS.json", "w") as f:
        json.dump(details, f, indent=2)

    print(json.dumps({
        "metric": "external C2C throughput geomean N=32..4096 (fp32, fused "
                  "Pallas, in+out traffic)",
        "value": round(value, 1),
        "unit": "GB/s",
        "vs_baseline": round(value / BASELINE_EXTERNAL_GBS, 3),
    }))


if __name__ == "__main__":
    main()
