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
plus an XLA-native jnp.fft comparison, a same-method copy roofline, a
huge-N sweep (fft_large / rfft_large, 2**15..2**25), and a correctness
gate vs numpy.fft for every shipped precision mode.

Metric: geometric-mean external-path (forward C2C) throughput in GB/s
(in+out traffic).  vs_baseline compares against the reference's published
V100 external throughput (8 GB in ~10.45 ms = 822 GB/s, README.md:84-91 /
BASELINE.md).

Timing: DEVICE-SIDE profiler durations (utils/prof_timing.py) — the
TPU's own trace counters around each XLA program, the analogue of the
reference's cudaEvent GpuTimer (timer.h:6-40).  Host-side wall clocks on
the axon tunnel carry 2-3x phase-varying dispatch noise; device
durations are reproducible to ~1%.  The same method times a pure copy
kernel — the true achievable roofline on this chip is ~657 GB/s (copy,
scale, and the FFT all converge there), and that copy roofline is
reported alongside for an honest roofline fraction.

Budget discipline (VERDICT r4 weak #1: the round-4 run overran the
driver budget, rc 124, and lost ALL its evidence): sections run in
priority order — headline sizes, correctness gate, huge-N core sizes,
extended 8192/16384 rows, huge-N fill sizes — each behind a remaining-
time guard; BENCH_DETAILS.json is flushed after every row; and a
watchdog thread plus SIGTERM handler print the final JSON line from
whatever completed, so a timeout can no longer void the run.  Override
the internal budget with SMFFT_BENCH_BUDGET (seconds, default 1500).

Feature flags (config.py, the debug.h analogue): SMFFT_EXTERNAL gates the
external/ordered/real rows, SMFFT_MULTIPLE the in-VMEM reuse rows,
SMFFT_TESTING the correctness gate.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

import numpy as np

SIZES = (32, 64, 128, 256, 512, 1024, 2048, 4096)
EXTENDED_SIZES = (8192, 16384)     # beyond the reference sweep
PLANE_MB = 512                     # per-plane working set
MULT_ITERS = 100                   # NREUSES (FFT-GPU-32bit.cu:10)
BASELINE_EXTERNAL_GBS = 822.0      # V100 reference, BASELINE.md

#: huge-N sweep: core sizes first (always measured), fill sizes after
#: (budget permitting); jnp.fft twin only at <= 2**21 (its compile is
#: the slowest single item in the whole bench).
LARGE_CORE = (15, 18, 21, 24)
LARGE_FILL = (16, 17, 19, 20, 22, 23, 25)
LARGE_JNP_MAX = 21

_T0 = time.time()
_BUDGET = float(os.environ.get("SMFFT_BENCH_BUDGET", "1500"))


def remaining() -> float:
    return _BUDGET - (time.time() - _T0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class Bench:
    """Collects rows, flushes BENCH_DETAILS.json incrementally, and
    guarantees the final JSON line prints exactly once — on normal
    completion, on SIGTERM (the driver's `timeout`), or via the
    watchdog thread (which fires even if a remote compile hangs)."""

    def __init__(self):
        self.details: dict = {"sizes": {}, "large": {}}
        self.ext_gbs: list[float] = []
        self._done = False
        self._lock = threading.Lock()

    def flush(self):
        # preserve sections merged in by tools/accuracy_sweep.py and
        # tools/multiple_ablation.py across bench reruns
        try:
            with open("BENCH_DETAILS.json") as f:
                old = json.load(f)
            for k in ("accuracy", "accuracy_bound_model",
                      "multiple_ablation", "multiple_ablation_note",
                      "ordered_merge_ablation",
                      "ordered_merge_ablation_note"):
                if k in old and k not in self.details:
                    self.details[k] = old[k]
        except (OSError, ValueError):
            pass
        tmp = "BENCH_DETAILS.json.tmp"
        with open(tmp, "w") as f:
            json.dump(self.details, f, indent=2)
        os.replace(tmp, "BENCH_DETAILS.json")

    def finish(self, reason: str = "complete") -> None:
        with self._lock:
            if self._done:
                return
            self._done = True
        ext = [g for g in self.ext_gbs if g > 0]
        value = float(np.exp(np.mean(np.log(ext)))) if ext else 0.0
        self.details["external_geomean_gbs"] = value
        self.details["bench_elapsed_s"] = round(time.time() - _T0, 1)
        self.details["bench_finish_reason"] = reason
        roof = self.details.get("copy_roofline_gbs")
        if roof:
            self.details["external_roofline_fraction"] = value / roof
        try:
            self.flush()
        except OSError:
            pass
        print(json.dumps({
            "metric": "external C2C throughput geomean N=32..4096 (fp32, "
                      "fused Pallas, in+out traffic, device-side timing)",
            "value": round(value, 1),
            "unit": "GB/s",
            "vs_baseline": round(value / BASELINE_EXTERNAL_GBS, 3),
        }), flush=True)


def main():
    bench = Bench()

    def _on_term(signum, frame):  # noqa: ARG001
        log(f"bench: signal {signum} — emitting partial result")
        bench.finish(reason=f"signal {signum}")
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    watchdog = threading.Timer(
        max(10.0, _BUDGET - 15.0),
        lambda: (log("bench: watchdog budget expired — emitting partial "
                     "result"),
                 bench.finish(reason="watchdog"), os._exit(0)))
    watchdog.daemon = True
    watchdog.start()

    from smfft_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.ops import pallas_real as PR
    from smfft_tpu.config import flags
    from smfft_tpu.utils.prof_timing import device_time_ms

    log(f"bench device: {jax.devices()[0].device_kind} "
        f"({jax.default_backend()}), budget {_BUDGET:.0f}s")

    details = bench.details

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    force = jax.jit(lambda a: jnp.sum(jnp.abs(jnp.real(a[:1, :8]))))

    def timed_gbs(fsync, nbytes, match=r"^jit_run"):
        ms = device_time_ms(fsync, reps=5, match=match)
        return nbytes / ms / 1e6, ms

    details["device"] = str(jax.devices()[0])
    details["method"] = ("device-side profiler durations "
                         "(jax.profiler trace, median of 5)")

    # ---- copy roofline, same method and working-set shape -------------
    rows = (PLANE_MB * 2 ** 20) // (2048 * 4)
    a = devdata(rows, 2048, 1)
    b = devdata(rows, 2048, 2)

    @jax.jit
    def run_copy(x, y):
        return x * jnp.float32(1.01), y * jnp.float32(1.01)

    def f_copy():
        out = run_copy(a, b)
        float(force(out[0]))
    try:
        gbs, _ = timed_gbs(f_copy, 4 * rows * 2048 * 4,
                           match=r"^jit_run_copy")
        details["copy_roofline_gbs"] = gbs
        log(f"copy roofline: {gbs:6.1f} GB/s")
    except Exception as e:  # noqa: BLE001
        details["copy_roofline_gbs"] = None
        log(f"copy roofline FAILED: {str(e)[:120]}")
    bench.flush()

    # ---- per-size rows (the reference sweep + extended sizes) ---------
    def run_size(n: int, extras: bool):
        """One size's rows.  ``extras`` gates everything beyond the
        headline external row (inverse/ordered/real/multiple)."""
        ncols = max(n, 128)
        rows_n = 1 << (((PLANE_MB * 2 ** 20) // (ncols * 4)).bit_length()
                       - 1)
        entry = details["sizes"].setdefault(str(n), {})
        entry["rows"] = rows_n
        vr = devdata(rows_n, ncols, 2 * n)
        vi = devdata(rows_n, ncols, 2 * n + 1)
        nbytes = 4 * rows_n * ncols * 4
        s = jnp.float32(1.0)

        def mk(mult=0, inverse=False, ordered=False, precision="highest"):
            def fsync():
                out = PC.fft_planar(vr, vi, n, scale=s,
                                    multiple_iters=mult, inverse=inverse,
                                    ordered=ordered, precision=precision)
                float(force(out[0]))
            return fsync

        def measure(label, key, fsync, bytes_or_none, ffts=None):
            """One bench row; its own try + one retry so a flaky remote
            compile (known intermittent HTTP 500s/hangs on this tunnel)
            can't void the rest of the size's rows."""
            for attempt in (0, 1):
                try:
                    gbs, ms = timed_gbs(fsync, bytes_or_none or nbytes)
                    if ffts is not None:
                        entry[key] = ffts / (ms * 1e-3) / 1e6
                        log(f"n={n:5d} {label}: {entry[key]:8.1f} MFFT/s "
                            f"({MULT_ITERS}x in-VMEM)")
                    else:
                        entry[key] = gbs
                        log(f"n={n:5d} {label}: {gbs:6.1f} GB/s")
                    return gbs
                except Exception as e:  # noqa: BLE001
                    if attempt:
                        entry[key + "_error"] = str(e)[:160]
                        log(f"n={n:5d} {label} FAILED: {str(e)[:100]}")
            return None

        if flags.external:
            gbs = measure("external", "external_gbs", mk(), nbytes)
            if gbs:
                entry["external_mffts"] = gbs * 1e9 / 16 / n / 1e6
                if n in SIZES:
                    bench.ext_gbs.append(gbs)
            if not extras:
                bench.flush()
                return
            measure("inverse ", "inverse_gbs", mk(inverse=True), nbytes)
            measure("ordered ", "ordered_gbs", mk(ordered=True), nbytes)
            if n in (1024, 4096):
                # the "exact" tier's throughput cost (VERDICT r4 #5):
                # split-accumulation lane dot at two representative sizes
                measure("external[exact]", "external_exact_gbs",
                        mk(precision="exact"), nbytes)
            # fused real transforms: 4B in + 4B out per real sample.
            # natural-order spectra (the reference's Stockham R2C/C2R
            # are always ordered): pencil kernel n <= 4096, matmul
            # kernel + in-kernel digit swap above
            if n >= 256:
                x_real = devdata(rows_n, n, 3 * n)

                def f_r2c():
                    out = PR.rfft_fused_planar(x_real, ordered=True)
                    float(force(out[0]))
                measure("r2c     ", "r2c_gbs", f_r2c, rows_n * n * 8)

                hr = devdata(rows_n, n // 2, 3 * n + 1)
                hi = devdata(rows_n, n // 2, 3 * n + 2)

                def f_c2r():
                    out = PR.irfft_fused_planar(hr, hi, n,
                                                in_natural=True)
                    float(force(out))
                measure("c2r     ", "c2r_gbs", f_c2r, rows_n * n * 8)
            if n == 1024:
                # fused FFT->filter->iFFT convolution (ops/convolve.py):
                # one representative size; traffic = signal in + out only
                # (the spectrum never leaves VMEM), so GB/s near the c2c
                # external rate means a WHOLE circular convolution runs
                # at the streaming cost of one FFT
                from smfft_tpu.ops import convolve as CVB
                ch_r = devdata(1, ncols, 9 * n)
                ch_i = devdata(1, ncols, 9 * n + 1)

                def f_conv():
                    out = CVB.convolve_planar(vr, vi, ch_r[0], ch_i[0], n)
                    float(force(out[0]))
                measure("convolve", "convolve_gbs", f_conv, nbytes)

                # real fused convolution: n real samples in + out
                rh_r = devdata(1, n // 2 + 128, 9 * n + 2)[0, :n // 2 + 1]
                rh_i = devdata(1, n // 2 + 128, 9 * n + 3)[0, :n // 2 + 1]

                def f_rconv():
                    out = CVB.convolve_real_planar(x_real, rh_r, rh_i, n)
                    float(force(out))
                measure("convolve[real]", "convolve_real_gbs", f_rconv,
                        rows_n * n * 8)

                # fused one-pass power spectrum (ops/spectral.py):
                # |rfft|^2 with the square inside the kernel — 6 HBM
                # bytes per real sample (4 in + 2 out)
                from smfft_tpu.ops import spectral as SPB

                def f_pow():
                    out = SPB.power_pencil_planar(x_real, n)
                    float(force(out))
                measure("power   ", "power_gbs", f_pow, rows_n * n * 6)

                # fused Bluestein (ops/chirp.py): arbitrary length
                # n=1000 rides an m=2048 in-VMEM convolution; useful
                # bytes = 1000 complex in + out per row
                from smfft_tpu.ops import chirp as CHB
                nb = 1000
                bl_r = devdata(rows_n, 1024, 11 * n)
                bl_i = devdata(rows_n, 1024, 11 * n + 1)

                def f_blu():
                    out = CHB.bluestein_planar(bl_r, bl_i, nb, 2048)
                    float(force(out[0]))
                measure("bluestein[n=1000]", "bluestein_n1000_gbs",
                        f_blu, rows_n * nb * 16)
        if flags.multiple:
            # multiple: one kernel with MULT_ITERS in-VMEM
            # re-applications per tile (single HBM pass bracketing),
            # exactly the reference's NREUSES contract — device time
            # of that one kernel, directly
            if n <= 4096:
                ffts = rows_n * ncols // n * MULT_ITERS
                for prec, key in (("highest", "multiple_mffts"),
                                  ("high", "multiple_high_mffts"),
                                  ("fast", "multiple_fast_mffts")):
                    measure(f"multiple[{prec}]", key,
                            mk(mult=MULT_ITERS, precision=prec), nbytes,
                            ffts=ffts)
            else:
                # 8192/16384 in-row reuse loses to re-streaming on this
                # chip (VMEM-resident working set leaves too little
                # pipelining headroom; measured round 3-5) — reuse is
                # n/a (memory-bound), not a supported win. See
                # BASELINE.md "reuse at 8192/16384".
                entry["multiple_note"] = "n/a (memory-bound at this size)"
            if 32 <= n <= 4096:
                # pencil-layout reuse kernel: one relayout, then
                # MULT_ITERS pure-VPU radix ladders on VMEM-resident
                # pencils — the path that reproduces the reference's
                # 1.5-5x in-kernel-reuse speedup (ops/pencil.py).
                # pencil rows are one-FFT-per-row at any width, so
                # n < 128 uses unpacked (rows, n) arrays (same traffic)
                from smfft_tpu.ops import pencil as PEN

                if n < 128:
                    rows_p = rows_n * (128 // n)
                    pr = devdata(rows_p, n, 5 * n)
                    pi = devdata(rows_p, n, 5 * n + 1)
                else:
                    rows_p, pr, pi = rows_n, vr, vi

                def f_pen():
                    out = PEN.multiple_pencil_planar(
                        pr, pi, n, iters=MULT_ITERS)
                    float(force(out[0]))
                measure("multiple[pencil]", "multiple_pencil_mffts",
                        f_pen, nbytes, ffts=rows_p * MULT_ITERS)
            if 256 <= n <= 4096:
                # REAL-transform in-VMEM reuse (the R2C
                # FFT_multiple_benchmark analogue, R2C_C2R/FFT-GPU-
                # 32bit-Stockham.cu:435-467): MULT_ITERS transforms as
                # rfft->irfft pairs on VMEM-resident pencils; counted
                # in MFFT/s of real transforms (each pair = 2)
                x_rm = devdata(rows_n, n, 7 * n)

                def f_rmul():
                    out = PEN.multiple_real_pencil_planar(
                        x_rm, n, iters=MULT_ITERS)
                    float(force(out))
                measure("multiple[r2c]", "multiple_r2c_mffts",
                        f_rmul, rows_n * n * 8,
                        ffts=rows_n * MULT_ITERS)
        bench.flush()

    for n in SIZES:
        run_size(n, extras=True)

    # ---- correctness gate (numpy.fft float64 oracle), each precision --
    if flags.testing:
        rng = np.random.default_rng(0)
        for n in (1024, 4096):
            c = n // 128
            x = (rng.random((256, n)) + 1j * rng.random((256, n))
                 - 0.5 - 0.5j).astype(np.complex64)
            cvr = jnp.array(np.ascontiguousarray(x.real))
            cvi = jnp.array(np.ascontiguousarray(x.imag))
            ref = np.fft.fft(x.astype(np.complex128))
            for prec in ("highest", "high", "fast", "default"):
                o_r, o_i = PC.fft_planar(cvr, cvi, n, precision=prec)
                got = np.asarray(o_r) + 1j * np.asarray(o_i)
                got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(
                    -1, n)
                err = float(np.max(np.abs(got - ref)))
                details[f"max_abs_err_n{n}_{prec}"] = err
                log(f"correctness(n={n}, {prec}): max abs err vs "
                    f"numpy.fft = {err:.3e}")
        bench.flush()

    # ---- XLA-native jnp.fft comparison at N=1024 (same method) --------
    try:
        rows_j = 1 << (((PLANE_MB * 2 ** 20) // (1024 * 4)).bit_length()
                       - 1)
        jr = devdata(rows_j, 1024, 7)
        ji = devdata(rows_j, 1024, 8)

        @jax.jit
        def run_jnpfft(p, q):
            return jnp.real(jnp.fft.fft(jax.lax.complex(p, q)))

        def f_jnp():
            out = run_jnpfft(jr, ji)
            float(force(out))
        gbs, _ = timed_gbs(f_jnp, 4 * rows_j * 1024 * 4,
                           match=r"^jit_run_jnpfft")
        details["jnp_fft_n1024_gbs"] = gbs
        log(f"jnp.fft n=1024: {gbs:6.1f} GB/s")
    except Exception as e:  # noqa: BLE001
        details["jnp_fft_n1024_gbs"] = None
        log(f"jnp.fft comparison FAILED: {str(e)[:120]}")
    bench.flush()

    # ---- huge-N sweep (beyond the reference's 4096 cap) ----------------
    # fft_large / rfft_large per size with a jnp.fft twin column (<=
    # 2**21) and a numpy.fft accuracy gate — the same evidence standard
    # as the row-size table.  GB/s here is EFFECTIVE external throughput
    # (in+out useful bytes; the pipeline makes 1-3 physical passes), not
    # a roofline claim.
    def run_large(e: int):
        from smfft_tpu import planar as PLA
        rng_l = np.random.default_rng(42 + e)
        nL = 1 << e
        bL = max(8, min(96, (128 << 20) // (8 * nL))) // 8 * 8
        entry = details["large"].setdefault(str(nL), {})
        entry["batch"] = bL
        try:
            lr = devdata(bL, nL, 17 + e)
            li = devdata(bL, nL, 170 + e)

            def f_large():
                out = PLA.fft_large(lr, li)
                float(force(out[0]))
            gbs, ms = timed_gbs(f_large, bL * nL * 16, match=r"^jit_run")
            entry["fft_large_gbs"] = gbs

            jgbs = None
            if e <= LARGE_JNP_MAX:
                @jax.jit
                def run_large_jnp(p, q):
                    return jnp.real(jnp.fft.fft(jax.lax.complex(p, q)))

                def f_large_jnp():
                    out = run_large_jnp(lr, li)
                    float(force(out))
                try:
                    jgbs, _ = timed_gbs(f_large_jnp, bL * nL * 16,
                                        match=r"^jit_run_large_jnp")
                except Exception as je:  # noqa: BLE001
                    entry["jnp_error"] = str(je)[:100]
                entry["jnp_fft_gbs"] = jgbs
            ratio = f"{gbs / jgbs:4.1f}x jnp" if jgbs else "jnp n/a"
            log(f"fft_large 2^{e}: {gbs:6.1f} GB/s eff "
                f"(jnp {jgbs or 0:5.1f}, {ratio}, batch {bL})")

            # accuracy gate vs numpy.fft float64 (small batch)
            xa = (rng_l.standard_normal((2, nL)).astype(np.float32),
                  rng_l.standard_normal((2, nL)).astype(np.float32))
            o_r, o_i = PLA.fft_large(jnp.asarray(xa[0]),
                                     jnp.asarray(xa[1]))
            ref = np.fft.fft(xa[0].astype(np.float64)
                             + 1j * xa[1].astype(np.float64))
            got = np.asarray(o_r) + 1j * np.asarray(o_i)
            entry["rel_err"] = float(np.max(np.abs(got - ref))
                                     / np.max(np.abs(ref)))
            log(f"  accuracy 2^{e}: rel err {entry['rel_err']:.2e}")
        except Exception as ex:  # noqa: BLE001
            entry["error"] = str(ex)[:160]
            log(f"fft_large 2^{e} FAILED: {str(ex)[:120]}")
        bench.flush()
        # rfft_large at real length 2*nL (same internal L, same
        # logical bytes as fft_large at nL)
        if remaining() < 60:
            return
        try:
            xr_l = devdata(bL, 2 * nL, 19 + e)

            def f_rlarge():
                out = PLA.rfft_large(xr_l)
                float(force(out[0]))
            rgbs, _ = timed_gbs(f_rlarge, bL * 2 * nL * 8,
                                match=r"^jit_run")
            entry["rfft_large_gbs"] = rgbs
            log(f"rfft_large 2^{e + 1}: {rgbs:6.1f} GB/s eff")
            xb = rng_l.standard_normal((2, 2 * nL)).astype(np.float32)
            hr, hi = PLA.rfft_large(jnp.asarray(xb))
            ref = np.fft.rfft(xb.astype(np.float64))
            got = np.asarray(hr) + 1j * np.asarray(hi)
            # packed layout: slot 0 = DC + i*Nyq
            full = np.concatenate(
                [got[:, :1].real, got[:, 1:],
                 1j * got[:, :1].imag], axis=-1)
            full[:, 0] = got[:, 0].real
            full[:, -1] = got[:, 0].imag
            entry["rfft_rel_err"] = float(
                np.max(np.abs(full - ref)) / np.max(np.abs(ref)))
            log(f"  r2c accuracy: rel err {entry['rfft_rel_err']:.2e}")
        except Exception as ex:  # noqa: BLE001
            entry["rfft_error"] = str(ex)[:160]
            log(f"rfft_large 2^{e + 1} FAILED: {str(ex)[:120]}")
        bench.flush()

    if flags.external:
        for e in LARGE_CORE:
            if remaining() < 180:
                log(f"bench: skipping large core 2^{e}+ "
                    f"({remaining():.0f}s left)")
                details.setdefault("skipped", []).append(f"large_2^{e}+")
                break
            run_large(e)

    # ---- extended sizes 8192/16384 (beyond the reference sweep) -------
    for n in EXTENDED_SIZES:
        if remaining() < 150:
            log(f"bench: skipping extended n={n} ({remaining():.0f}s "
                f"left)")
            details.setdefault("skipped", []).append(f"n{n}")
            continue
        run_size(n, extras=True)

    # ---- huge-N fill sizes (budget permitting) -------------------------
    if flags.external:
        for e in LARGE_FILL:
            if remaining() < 180:
                log(f"bench: skipping large fill 2^{e} "
                    f"({remaining():.0f}s left)")
                details.setdefault("skipped", []).append(f"large_2^{e}")
                continue
            run_large(e)

    watchdog.cancel()
    bench.finish()


if __name__ == "__main__":
    main()
