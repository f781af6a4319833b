#!/usr/bin/env python
"""Render the benchmark sweep as a README-style markdown table.

Reproduces the shape of the reference's published table
(/root/reference/README.md:79-91): one row per FFT size with the
"multiple" (in-VMEM) and "external" (HBM-bound) paths side by side,
plus the inverse/ordered/real-transform externals.
Reads BENCH_DETAILS.json (written by bench.py); pass --run to execute
bench.py first.
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent

COLS = (("external_gbs", "ext GB/s"), ("inverse_gbs", "inv GB/s"),
        ("ordered_gbs", "ord GB/s"), ("r2c_gbs", "r2c GB/s"),
        ("c2r_gbs", "c2r GB/s"), ("convolve_gbs", "conv GB/s"),
        ("convolve_real_gbs", "rconv GB/s"),
        ("external_mffts", "ext MFFT/s"),
        ("multiple_mffts", "mult MFFT/s"),
        ("multiple_pencil_mffts", "mult[pencil] MFFT/s"),
        ("multiple_r2c_mffts", "mult[r2c] MFFT/s"),
        ("multiple_high_mffts", "mult[high] MFFT/s"),
        ("multiple_fast_mffts", "mult[fast] MFFT/s"))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--run", action="store_true", help="run bench.py first")
    ap.add_argument("--details", default=str(REPO / "BENCH_DETAILS.json"))
    args = ap.parse_args()

    if args.run:
        subprocess.run([sys.executable, str(REPO / "bench.py")], check=True)

    with open(args.details) as f:
        d = json.load(f)

    print(f"Device: {d.get('device', '?')}  "
          f"(method: {d.get('method', '?')})\n")
    print("| FFT size | " + " | ".join(h for _, h in COLS) + " |")
    print("|---:|" + "---:|" * len(COLS))
    for n, e in sorted(d["sizes"].items(), key=lambda kv: int(kv[0])):
        if "external_gbs" not in e and any(k.endswith("_error")
                                           for k in e):
            print(f"| {n} |" + " error |" * len(COLS))
            continue
        cells = []
        for key, _ in COLS:
            v = e.get(key)
            cells.append(f"{v:.1f}" if isinstance(v, (int, float))
                         else "n/a")
        print(f"| {n} | " + " | ".join(cells) + " |")
    print()
    print(f"geomean external: {d.get('external_geomean_gbs', 0):.1f} GB/s; "
          f"jnp.fft N=1024: {d.get('jnp_fft_n1024_gbs')} GB/s")
    for n in (1024, 4096):
        for prec in ("highest", "high", "fast", "default"):
            k = f"max_abs_err_n{n}_{prec}"
            if k in d:
                print(f"max abs err N={n} ({prec}): {d[k]:.3e}")


if __name__ == "__main__":
    main()
