#!/usr/bin/env python
"""Render the benchmark sweep as a README-style markdown table.

Reproduces the shape of the reference's published table
(/root/reference/README.md:79-91): one row per FFT size with the
"multiple" (in-VMEM) and "external" (HBM-bound) paths side by side.
Reads BENCH_DETAILS.json (written by bench.py); pass --run to execute
bench.py first.
"""

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent


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
    print("| FFT size | external GB/s | ordered GB/s | external MFFT/s "
          "| multiple MFFT/s |")
    print("|---:|---:|---:|---:|---:|")
    for n, e in sorted(d["sizes"].items(), key=lambda kv: int(kv[0])):
        if "error" in e and "external_gbs" not in e:
            print(f"| {n} | error | error | error | error |")
            continue
        print(f"| {n} | {e.get('external_gbs', float('nan')):.1f} "
              f"| {e.get('ordered_gbs', float('nan')):.1f} "
              f"| {e.get('external_mffts', float('nan')):.1f} "
              f"| {e.get('multiple_mffts', float('nan')):.1f} |")
    print()
    print(f"geomean external: {d.get('external_geomean_gbs', 0):.1f} GB/s; "
          f"jnp.fft N=1024: {d.get('jnp_fft_n1024_gbs')} GB/s")
    for prec in ("highest", "high", "default"):
        k = f"max_abs_err_n1024_{prec}"
        if k in d:
            print(f"max abs err N=1024 ({prec}): {d[k]:.3e}")


if __name__ == "__main__":
    main()
