#!/usr/bin/env python
"""Golden-reference verification harness — the reference's L4 main().

Usage (mirrors the reference CLIs):
  python verify.py <FFT_size> <nFFTs> <nRuns> [inverse] [reorder]
                   [--kind c2c|r2c|c2r] [--backend auto|pallas|xla|spec]
                   [--seed S] [--two-tone] [--tolerance T]

Positional args follow SMFFT_CooleyTukey_C2C/FFT.c:84-92
(`FFT_size nFFTs nRuns inverse reorder`); the Stockham variants' 3-arg form
works too.  Each run generates seeded input (deterministic — the reference
seeds with time(NULL), FFT.c:139; we fix that per SURVEY.md §4), computes
the numpy.fft golden spectrum in float64, executes the transform on the
default JAX device, compares with the reference's hybrid error metric and
tolerance (1e-4, FFT.c:12) via the native C harness, and prints timing plus
an ANSI green PASSED / red FAILED verdict (FFT.c:158-159).

nFFTs is rounded up to the packing multiple for N=32/64 exactly like the
reference (FFT.c:105-116).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

GREEN, RED, RESET = "\033[1;32m", "\033[1;31m", "\033[0m"


def parse_args(argv):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("fft_size", type=int)
    p.add_argument("n_ffts", type=int)
    p.add_argument("n_runs", type=int, nargs="?", default=1)
    p.add_argument("inverse", type=int, nargs="?", default=0)
    p.add_argument("reorder", type=int, nargs="?", default=1)
    p.add_argument("--kind", choices=["c2c", "r2c", "c2r"], default="c2c")
    p.add_argument("--backend", default="auto")
    p.add_argument("--precision", default="highest")
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--two-tone", action="store_true",
                   help="two-tone fixture instead of uniform noise")
    p.add_argument("--tolerance", type=float, default=1e-4,
                   help="reference max_error (FFT.c:12)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    from smfft_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp
    from smfft_tpu import api, native
    from smfft_tpu.config import flags

    # eager ops on complex arrays are unsupported on some backends (axon);
    # force completion through a jitted real-valued reduction
    force = jax.jit(lambda a: jnp.sum(jnp.abs(jnp.real(a[:1, :8]))))
    from smfft_tpu.ops import matmul_fft
    from smfft_tpu.utils import transfer

    n, n_ffts = args.fft_size, args.n_ffts
    # round up to the packing multiple (reference FFT.c:105-116)
    pack = max(1, 128 // n) if args.kind == "c2c" else 1
    if n_ffts % pack:
        n_ffts += pack - n_ffts % pack
        print(f"nFFTs rounded up to {n_ffts} (multiple of {pack})")
    # row-group packing wants multiples of 8 rows; round up quietly
    rows_mult = 8 * pack
    if n_ffts % rows_mult:
        n_ffts += rows_mult - n_ffts % rows_mult
        print(f"nFFTs rounded up to {n_ffts} (row-group multiple)")

    print(f"device: {jax.devices()[0].device_kind} "
          f"({jax.default_backend()}), kind={args.kind}, N={n}, "
          f"nFFTs={n_ffts}, runs={args.n_runs}, inverse={args.inverse}, "
          f"reorder={args.reorder}, backend={args.backend}")

    def timed_runs(fn, *inputs):
        """Warm up, time n_runs (host wall clock incl. dispatch), and on
        TPU also read the DEVICE-side kernel time via the profiler — the
        GpuTimer-comparable number (VERDICT r2 weak #7; host wall clock
        on the axon tunnel carries 2-3x dispatch noise)."""
        _ = float(force(fn(*inputs)))  # compile warm-up (untimed, like
        # the reference timing kernels only, FFT-GPU-32bit.cu:868-869)
        times, out = [], None
        for _ in range(args.n_runs):
            t0 = time.perf_counter()
            out = fn(*inputs)
            _ = float(force(out))
            times.append(time.perf_counter() - t0)
        dev_ms = None
        if jax.default_backend() == "tpu":
            from smfft_tpu.utils.prof_timing import device_time_ms
            try:
                dev_ms = device_time_ms(
                    lambda: float(force(fn(*inputs))),
                    reps=max(3, min(args.n_runs, 5)), match=r"^jit_")
            except Exception as e:  # noqa: BLE001 - fall back to wall clock
                print(f"(device timing unavailable: {str(e)[:80]})")
        return out, times, dev_ms

    if args.kind == "c2c":
        if args.two_tone:
            re = native.generate_two_tone(n_ffts, n)
            im = np.zeros_like(re)
        else:
            re = native.generate_uniform(n_ffts * n, args.seed).reshape(
                n_ffts, n)
            im = native.generate_uniform(n_ffts * n, args.seed + 1).reshape(
                n_ffts, n)
        x = (re + 1j * im).astype(np.complex64)
        golden = (np.fft.ifft(x.astype(np.complex128)) * n if args.inverse
                  else np.fft.fft(x.astype(np.complex128)))

        xd = transfer.to_device_complex(x)
        import functools
        kw = dict(ordered=bool(args.reorder), backend=args.backend,
                  precision=args.precision)
        if args.inverse:
            kw["norm"] = None  # reference contract: unnormalized
        # jit the whole transform: eager complex intermediates are
        # unsupported on some backends (axon)
        fn = jax.jit(functools.partial(
            api.ifft if args.inverse else api.fft, **kw))
        out, times, dev_ms = timed_runs(fn, xd)
        got = transfer.from_device_complex(out)
        if not args.reorder:
            # unordered output is a backend-defined fixed permutation; the
            # reference skips verification here (FFT.c:161-163) — we
            # un-permute per backend and verify anyway.
            backend = args.backend
            if backend == "auto":
                backend = ("pallas" if jax.default_backend() == "tpu"
                           else "xla")
            if backend == "pallas":
                c = max(1, n // 128)
                if c > 1:
                    got = got.reshape(n_ffts, c, 128).transpose(
                        0, 2, 1).reshape(n_ffts, n)
            elif backend == "spec":
                from smfft_tpu.models import cooley_tukey
                got = got[:, cooley_tukey.bit_reverse_indices(n)]
            else:
                from smfft_tpu import params as _P
                perm = matmul_fft.digit_reverse_indices(
                    n, _P.get_factorization(n))
                got = got[:, perm]
        stats = (native.compare(got, golden.astype(np.complex64),
                                args.tolerance) if flags.testing else None)
    elif args.kind == "r2c":
        x = native.generate_uniform(n_ffts * n, args.seed).reshape(n_ffts, n)
        golden = np.fft.rfft(x.astype(np.float64)).astype(np.complex64)
        xd = jnp.array(x)
        import functools
        packed_real = jax.jit(functools.partial(
            api.fft_packed_real, backend=args.backend,
            precision=args.precision))
        out, times, dev_ms = timed_runs(packed_real, xd)
        got = transfer.from_device_complex(out)
        stats = (native.compare_r2c_packed(got, golden, args.tolerance)
                 if flags.testing else None)
    else:  # c2r
        xsig = native.generate_uniform(n_ffts * n, args.seed).reshape(
            n_ffts, n)
        spec = np.fft.rfft(xsig.astype(np.float64)).astype(np.complex64)
        golden = xsig  # unnormalized output compares at scale N/2
        sd = transfer.to_device_complex(spec)
        import functools
        irfft = jax.jit(functools.partial(
            api.irfft, n=n, backend=args.backend,
            precision=args.precision, norm=None))
        out, times, dev_ms = timed_runs(irfft, sd)
        got = np.asarray(out)
        stats = (native.compare_real(got, golden, got_scale=n // 2,
                                     want_scale=1.0,
                                     tolerance=args.tolerance)
                 if flags.testing else None)

    mean_ms = 1e3 * float(np.mean(times))
    print(f"smFFT-tpu time: {mean_ms:.3f} ms/run (mean of {args.n_runs}; "
          f"includes dispatch)")
    if dev_ms is not None:
        print(f"smFFT-tpu device time: {dev_ms:.3f} ms/run "
              f"(profiler trace, kernel only — GpuTimer analogue)")
    if stats is None:
        # reference behavior with TESTING off: timing only, no golden
        # compare (SMFFT_Stockham_C2C/FFT.c:138-144, debug.h:3)
        print("no verification (SMFFT_TESTING=0)")
        return 0
    print(f"total error: {stats['total_error']:.6e}  "
          f"mean error: {stats['mean_error']:.6e}  "
          f"max error: {stats['max_error']:.6e}")
    ok = stats["error_count"] == 0
    verdict = f"{GREEN}PASSED{RESET}" if ok else (
        f"{RED}FAILED{RESET} ({stats['error_count']} elements over "
        f"tolerance {args.tolerance})")
    print(verdict)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
