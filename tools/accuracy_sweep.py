#!/usr/bin/env python
"""Accuracy sweep: max abs error vs float64 numpy.fft for every shipped
mode — all sizes x {c2c fwd ordered, c2c fwd unordered, c2c inverse,
r2c, c2r} x {exact, highest, high, fast} (VERDICT r1 item 6; "exact" r4 #5).

Merges the table into BENCH_DETAILS.json under "accuracy" and prints a
markdown table for BASELINE.md.  Run on the attached TPU (Mosaic
numerics); the documented bound per mode is tol(n, prec) =
base[prec] * n^0.75 * 8 with base = 2e-7 (highest/high; fp32 floor) and
4e-6 ("fast", bf16x3 fast-math class).  The reference's own acceptance
gate is a flat 1e-4 (SMFFT_CooleyTukey_C2C/FFT.c:12).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SIZES = (32, 64, 128, 256, 512, 1024, 2048, 4096, 8192, 16384)
REAL_SIZES = (256, 512, 1024, 2048, 4096, 8192, 16384)
BASE = {"exact": 1e-7, "highest": 2e-7, "fast": 4e-6}


def tol(n, prec):
    if prec == "high":
        # "high" is the CONTRACT tier: max abs err <= 1e-4 at every
        # size (the reference's gate, FFT.c:12) — a flat bound by
        # definition, not an fp32-floor scaling
        return 1e-4
    return BASE[prec] * n ** 0.75 * 8


def _flush(acc):
    """Merge-flush: existing tiers' rows survive a partial run (the
    monolithic 4-tier sweep exceeds any sane TPU budget — round-5
    lesson: ~280 kernel compiles)."""
    path = "BENCH_DETAILS.json"
    try:
        with open(path) as f:
            details = json.load(f)
    except (FileNotFoundError, ValueError):
        details = {}
    merged = details.get("accuracy", {})
    merged.update(acc)
    details["accuracy"] = merged
    details["accuracy_bound_model"] = (
        "base * n^0.75 * 8; base: exact 1e-7, highest/high 2e-7, "
        "fast 4e-6")
    with open(path, "w") as f:
        json.dump(details, f, indent=2)


def main():
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.ops import pallas_real as PR

    tiers = tuple(sys.argv[1:]) or ("exact", "highest", "high", "fast")
    rng = np.random.default_rng(7)
    acc = {}
    rows_md = []
    for prec in tiers:
        for n in SIZES:
            x = (rng.random((64, n)) + 1j * rng.random((64, n))
                 - 0.5 - 0.5j).astype(np.complex64)
            vr = jnp.array(np.ascontiguousarray(x.real))
            vi = jnp.array(np.ascontiguousarray(x.imag))
            c = max(1, n // 128)
            ncols = max(n, 128)
            rows = 64 * n // ncols
            vr2, vi2 = vr.reshape(rows, ncols), vi.reshape(rows, ncols)
            ref_f = np.fft.fft(x.astype(np.complex128))
            ref_i = np.fft.ifft(x.astype(np.complex128)) * n
            ent = {}
            # unordered forward (un-permute on host for compare)
            o_r, o_i = PC.fft_planar(vr2, vi2, n, precision=prec)
            got = (np.asarray(o_r) + 1j * np.asarray(o_i)).reshape(-1, n)
            if c > 1:
                got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(
                    -1, n)
            ent["c2c_fwd_unordered"] = float(np.max(np.abs(got - ref_f)))
            # ordered forward
            o_r, o_i = PC.fft_planar(vr2, vi2, n, precision=prec,
                                     ordered=True)
            got = (np.asarray(o_r) + 1j * np.asarray(o_i)).reshape(-1, n)
            ent["c2c_fwd_ordered"] = float(np.max(np.abs(got - ref_f)))
            # ordered inverse (unnormalized contract)
            o_r, o_i = PC.fft_planar(vr2, vi2, n, precision=prec,
                                     ordered=True, inverse=True)
            got = (np.asarray(o_r) + 1j * np.asarray(o_i)).reshape(-1, n)
            ent["c2c_inv_ordered"] = float(np.max(np.abs(got - ref_i)))
            ent["bound"] = tol(n, prec)
            acc[f"{prec}_n{n}"] = ent
            _flush(acc)
            print(f"{prec} n={n} c2c done", file=sys.stderr)
        for n in REAL_SIZES:
            xr = (rng.random((64, n)) * 2 - 1).astype(np.float32)
            spec_ref = np.fft.rfft(xr.astype(np.float64))
            o_r, o_i = PR.rfft_fused_planar(jnp.array(xr), precision=prec)
            got = np.asarray(o_r) + 1j * np.asarray(o_i)
            L = n // 2
            c = L // 128
            nat = (got.reshape(-1, c, 128).transpose(0, 2, 1)
                   .reshape(-1, L)) if c > 1 else got
            full = np.concatenate(
                [np.real(nat[:, :1]), nat[:, 1:],
                 np.imag(nat[:, :1])], axis=1)
            full[:, 0] = np.real(nat[:, 0])
            ent = acc.setdefault(f"{prec}_n{n}", {})
            ent["r2c"] = float(np.max(np.abs(full - spec_ref)))
            back = np.asarray(PR.irfft_fused_planar(
                o_r, o_i, n, precision=prec)) / L
            ent["c2r_roundtrip"] = float(np.max(np.abs(back - xr)))
            # natural-order paths (pencil kernels at small n, pair-rows
            # kernels at large n — the DEFAULT public dispatch)
            n_r, n_i = PR.rfft_fused_planar(jnp.array(xr), precision=prec,
                                            ordered=True)
            nat2 = np.asarray(n_r) + 1j * np.asarray(n_i)
            full2 = np.concatenate(
                [np.real(nat2[:, :1]), nat2[:, 1:],
                 np.imag(nat2[:, :1])], axis=1)
            full2[:, 0] = np.real(nat2[:, 0])
            ent["r2c_nat"] = float(np.max(np.abs(full2 - spec_ref)))
            back2 = np.asarray(PR.irfft_fused_planar(
                n_r, n_i, n, precision=prec, in_natural=True)) / L
            ent["c2r_nat_roundtrip"] = float(np.max(np.abs(back2 - xr)))
            ent.setdefault("bound", tol(n, prec))
            _flush(acc)
            print(f"{prec} n={n} real done", file=sys.stderr)

    # markdown
    print("| prec | N | c2c fwd (ord) | c2c fwd (unord) | c2c inv | "
          "r2c | c2r rt | r2c nat | c2r nat rt | bound | ref gate 1e-4 |")
    print("|---|---:|---:|---:|---:|---:|---:|---:|---:|---:|:--|")
    for prec in tiers:
        for n in sorted(set(SIZES) | set(REAL_SIZES)):
            e = acc.get(f"{prec}_n{n}")
            if not e:
                continue

            def fmt(k):
                return f"{e[k]:.2e}" if k in e else "—"
            worst = max(v for k, v in e.items() if k != "bound")
            gate = "PASS" if worst <= 1e-4 else "outside"
            print(f"| {prec} | {n} | {fmt('c2c_fwd_ordered')} | "
                  f"{fmt('c2c_fwd_unordered')} | {fmt('c2c_inv_ordered')} "
                  f"| {fmt('r2c')} | {fmt('c2r_roundtrip')} | "
                  f"{fmt('r2c_nat')} | {fmt('c2r_nat_roundtrip')} | "
                  f"{e['bound']:.2e} | {gate} |")

    _flush(acc)
    print("\nmerged into BENCH_DETAILS.json under 'accuracy'",
          file=sys.stderr)


if __name__ == "__main__":
    main()
