#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line for the driver.

Measures, across the reference's size sweep (N = 32..4096):
  * external forward  — fresh HBM input per transform, one fused kernel
    pass (the FFT_external_benchmark analogue,
    SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:583-664)
  * external inverse  — same, inverse direction (the reference's 32-case
    dispatch covers both directions, FFT-GPU-32bit.cu:599-659)
  * ordered           — natural-order output (CT+reorder / Stockham
    column of README.md:84-91)
  * r2c / c2r         — fused real transforms (the R2C_C2R variant's
    external benchmarks, SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-
    Stockham.cu:396-432,471-567)
  * multiple          — 100 in-VMEM re-applications (NREUSES analogue,
    FFT-GPU-32bit.cu:666-752), at the product precision and at "fast"
plus an XLA-native jnp.fft comparison and a correctness gate vs
numpy.fft for every shipped precision mode.

Metric: geometric-mean external-path (forward C2C) throughput in GB/s
(in+out traffic).  vs_baseline compares against the reference's published
V100 external throughput (8 GB in ~10.45 ms = 822 GB/s, README.md:84-91 /
BASELINE.md).  This chip's achievable HBM bandwidth is ~820-880 GB/s
(scale-op), so vs_baseline ~= roofline fraction here.

Timing discipline (axon tunnel: ~25 ms fixed dispatch+readback overhead,
unreliable block_until_ready, no host<->device complex transfers):
single-dispatch differencing — time one kernel call on a small and a big
on-device-generated working set (medians of 9) and divide the time delta
by the traffic delta.  Every sample is SANITY-GATED: deltas implying
throughput above ROOFLINE_CAP (impossible) or nonpositive are discarded
and retaken (ADVICE r1).  Best valid of 2 is reported (the tunnel's
dispatch constant has slow phases; capability is the reproducible upper
envelope).  Details land in BENCH_DETAILS.json; stderr logs progress;
stdout carries only the JSON line.

Feature flags (config.py, the debug.h analogue): SMFFT_EXTERNAL gates the
external/ordered/real rows, SMFFT_MULTIPLE the in-VMEM reuse rows,
SMFFT_TESTING the correctness gate.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

SIZES = (32, 64, 128, 256, 512, 1024, 2048, 4096)
SMALL_MB, BIG_MB = 16, 2048        # per-plane working sets
MULT_ITERS = 100                   # NREUSES (FFT-GPU-32bit.cu:10)
BASELINE_EXTERNAL_GBS = 822.0      # V100 reference, BASELINE.md
ROOFLINE_CAP = 950.0               # GB/s; measured chip peak ~820-880


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.ops import pallas_real as PR
    from smfft_tpu.config import flags

    log(f"bench device: {jax.devices()[0].device_kind} "
        f"({jax.default_backend()})")

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    force = jax.jit(lambda a: jnp.sum(jnp.abs(jnp.real(a[:1, :8]))))

    def t_once(f):
        """Median wall time of one dispatch incl. forced completion."""
        out = f()
        first = out[0] if isinstance(out, tuple) else out
        float(force(first))
        vals = []
        for _ in range(9):
            t0 = time.perf_counter()
            out = f()
            first = out[0] if isinstance(out, tuple) else out
            float(force(first))
            vals.append(time.perf_counter() - t0)
        vals.sort()
        return vals[4]

    def diff_gbs(make_f, ncols, bytes_per_col=16):
        """GB/s via small/big differencing, sanity-gated: discards
        nonpositive deltas and samples above the roofline cap; best
        valid of 2, up to 6 attempts (ADVICE r1)."""
        valid = []
        for _attempt in range(6):
            ts = []
            for mb in (SMALL_MB, BIG_MB):
                rows = (mb * 2 ** 20) // (ncols * 4)
                rows = 1 << (rows.bit_length() - 1)
                f = make_f(rows)
                ts.append((rows, t_once(f)))
            (r0, t0), (r1, t1) = ts
            if t1 - t0 <= 1e-3:
                continue
            gbs = (r1 - r0) * ncols * bytes_per_col / (t1 - t0) / 1e9
            if gbs > ROOFLINE_CAP * bytes_per_col / 16.0:
                continue
            valid.append(gbs)
            if len(valid) == 2:
                break
        if not valid:
            raise RuntimeError("no valid timing sample after 6 attempts")
        return max(valid)

    details = {"sizes": {}, "device": str(jax.devices()[0]),
               "method": ("single-dispatch small/big differencing, "
                          "sanity-gated best-of-2 (cap "
                          f"{ROOFLINE_CAP} GB/s)")}
    ext_gbs = []
    for n in SIZES:
        ncols = max(n, 128)
        entry = {}

        def mk(rows, mult=0, inverse=False, ordered=False,
               precision="highest"):
            vr = devdata(rows, ncols, 2 * n)
            vi = devdata(rows, ncols, 2 * n + 1)
            s = jnp.float32(1.0)
            return lambda: PC.fft_planar(vr, vi, n, scale=s,
                                         multiple_iters=mult,
                                         inverse=inverse, ordered=ordered,
                                         precision=precision)
        try:
            if flags.external:
                gbs = diff_gbs(lambda r: mk(r), ncols)
                entry["external_gbs"] = gbs
                entry["external_mffts"] = gbs * 1e9 / 16 / n / 1e6
                ext_gbs.append(gbs)
                log(f"n={n:5d} external: {gbs:6.1f} GB/s  "
                    f"{entry['external_mffts']:8.1f} MFFT/s")
                gbs_i = diff_gbs(lambda r: mk(r, inverse=True), ncols)
                entry["inverse_gbs"] = gbs_i
                log(f"n={n:5d} inverse:  {gbs_i:6.1f} GB/s")
                gbs_o = diff_gbs(lambda r: mk(r, ordered=True), ncols)
                entry["ordered_gbs"] = gbs_o
                log(f"n={n:5d} ordered:  {gbs_o:6.1f} GB/s")
                # fused real transforms: 4B in + 4B out per real sample
                # -> 8 bytes per column at row width n
                if n >= 256:
                    def mk_r2c(rows):
                        x = devdata(rows, n, 3 * n)
                        return lambda: PR.rfft_fused_planar(x)
                    g_r2c = diff_gbs(mk_r2c, n, bytes_per_col=8)
                    entry["r2c_gbs"] = g_r2c
                    log(f"n={n:5d} r2c:      {g_r2c:6.1f} GB/s")

                    def mk_c2r(rows):
                        vr = devdata(rows, n // 2, 3 * n + 1)
                        vi = devdata(rows, n // 2, 3 * n + 2)
                        return lambda: PR.irfft_fused_planar(vr, vi, n)
                    g_c2r = diff_gbs(mk_c2r, n // 2, bytes_per_col=16)
                    entry["c2r_gbs"] = g_c2r
                    log(f"n={n:5d} c2r:      {g_c2r:6.1f} GB/s")
            if flags.multiple:
                # multiple: in-VMEM re-application (reference NREUSES
                # contract) by differencing two iteration counts on one
                # fixed working set — the delta is pure in-VMEM compute.
                rows_f = (32 * 2 ** 20) // (ncols * 4)
                rows_f = 1 << (rows_f.bit_length() - 1)
                for prec, key in (("highest", "multiple_mffts"),
                                  ("fast", "multiple_fast_mffts")):
                    it_lo, it_hi = 20, MULT_ITERS + 20
                    best = 0.0
                    for _ in range(2):
                        t_lo = t_once(mk(rows_f, mult=it_lo,
                                         precision=prec))
                        t_hi = t_once(mk(rows_f, mult=it_hi,
                                         precision=prec))
                        if t_hi - t_lo <= 1e-3:
                            continue
                        ffts = rows_f * ncols // n * (it_hi - it_lo)
                        best = max(best, ffts / (t_hi - t_lo) / 1e6)
                    entry[key] = best
                    log(f"n={n:5d} multiple[{prec}]: {best:8.1f} MFFT/s "
                        f"({MULT_ITERS}x in-VMEM)")
        except Exception as e:  # noqa: BLE001
            entry["error"] = str(e)[:200]
            log(f"n={n:5d} FAILED: {str(e)[:120]}")
        details["sizes"][str(n)] = entry

    # XLA-native jnp.fft comparison at N=1024 (same method)
    try:
        def mk_jnp(rows):
            vr = devdata(rows, 1024, 7)
            vi = devdata(rows, 1024, 8)
            f = jax.jit(lambda a, b: jnp.real(
                jnp.fft.fft(jax.lax.complex(a, b))))
            return lambda: (f(vr, vi),)
        gbs = diff_gbs(mk_jnp, 1024)
        details["jnp_fft_n1024_gbs"] = gbs
        log(f"jnp.fft n=1024: {gbs:6.1f} GB/s")
    except Exception as e:  # noqa: BLE001
        details["jnp_fft_n1024_gbs"] = None
        log(f"jnp.fft comparison FAILED: {str(e)[:120]}")

    # correctness gate (numpy.fft float64 oracle), every precision mode
    if flags.testing:
        rng = np.random.default_rng(0)
        for n in (1024, 4096):
            c = n // 128
            x = (rng.random((256, n)) + 1j * rng.random((256, n))
                 - 0.5 - 0.5j).astype(np.complex64)
            vr = jnp.array(np.ascontiguousarray(x.real))
            vi = jnp.array(np.ascontiguousarray(x.imag))
            ref = np.fft.fft(x.astype(np.complex128))
            for prec in ("highest", "high", "fast", "default"):
                o_r, o_i = PC.fft_planar(vr, vi, n, precision=prec)
                got = np.asarray(o_r) + 1j * np.asarray(o_i)
                got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(
                    -1, n)
                err = float(np.max(np.abs(got - ref)))
                details[f"max_abs_err_n{n}_{prec}"] = err
                log(f"correctness(n={n}, {prec}): max abs err vs "
                    f"numpy.fft = {err:.3e}")

    ext_gbs = [g for g in ext_gbs if g > 0]
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
