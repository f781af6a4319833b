#!/usr/bin/env python
"""Device-timed ablation of the ordered-output merge (VERDICT r2 #5).

Stages of the tdot_rows natural-order path (pallas_c2c, N = 1024/2048)
are individually disabled (timing-only, wrong data) to locate the
ordered-vs-unordered gap, and the retired merge structures are timed
for comparison.  Result (v5e, 512 MB working set, tiles 512/256/128):

  full tdot_rows        635 / 630 GB/s   (1024 / 2048, best tile)
  no blockrev           635 / 631        -> the 63-block sublane
                                            reversal is FREE
  plain pack (no row    655 / 654        -> the stride-c row INTERLEAVE
  interleave)                               (_pack_rows stack) is the
                                            ENTIRE ordered gap (~3%)
  pack only (no combos) 646 / 635        -> mirror combos ~1%
  digit-swap merge      466 / 461        (retired alternative)
  tdot_late merge       540 / 499        (retired alternative)

The wide transpose itself hides fully under the HBM stream (plain-pack
variants include it and reach the 656 roofline).  The interleave is
load-bearing: output rows k = k1*c + k2 take one row from each of the
c chunk products, so any natural-order emission must pay one
row-granular merge somewhere; the measured alternatives (lane-domain
digit swap 466, late lane recon 540) pay more.  Conclusion: tdot_rows
at 0.96-0.97x roofline is the optimal known structure; the residual
~3% is the irreducible stride-c sublane stack.

Results merged into BENCH_DETAILS.json under "ordered_merge_ablation".
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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

    orig_pack, orig_recon = PC._pack_rows, PC._rows_recon

    def pack_plain(zs, c):                 # timing-only: wrong order
        return jnp.concatenate(zs, axis=0)

    def recon_noblockrev(zq_r, zq_i):      # timing-only: wrong bottom
        c = len(zq_r)
        wr, wi = orig_pack(zq_r, c), orig_pack(zq_i, c)
        h = 64 * c
        u, v = wr[c:h], wi[h + c:]
        x, y = wr[h + c:], wi[c:h]
        out_r = jnp.concatenate([wr[:c], u - v, wr[h:h + c], u + v],
                                axis=0)
        out_i = jnp.concatenate([wi[:c], x + y, wi[h:h + c], y - x],
                                axis=0)
        return out_r, out_i

    def recon_packonly(zq_r, zq_i):        # timing-only: no combos
        c = len(zq_r)
        return orig_pack(zq_r, c), orig_pack(zq_i, c)

    results = {}
    for n in (1024, 2048):
        rows = 1 << (((512 * 2 ** 20) // (n * 8)).bit_length() - 1)
        vr, vi = devdata(rows, n, 1), devdata(rows, n, 2)
        nbytes = rows * n * 16
        cases = [
            ("full", "tdot_rows", orig_pack, orig_recon),
            ("no_blockrev", "tdot_rows", orig_pack, recon_noblockrev),
            ("plain_pack", "tdot_rows", pack_plain, orig_recon),
            ("pack_only", "tdot_rows", orig_pack, recon_packonly),
            ("digit_swap", "digit", orig_pack, orig_recon),
            ("tdot_late", "tdot_late", orig_pack, orig_recon),
        ]
        for label, merge, pk, rc in cases:
            PC._MERGE = merge if merge != "digit" else "digit"
            PC._pack_rows, PC._rows_recon = pk, rc
            PC._build.cache_clear()
            best = 0.0
            for tile in (512, 256, 128):
                try:
                    def f(t=tile):
                        o_r, _ = PC.fft_planar(vr, vi, n, ordered=True,
                                               tile_t=t)
                        float(force(o_r))
                    ms = device_time_ms(f, reps=5)
                    best = max(best, nbytes / ms / 1e6)
                except Exception as e:  # noqa: BLE001
                    print(f"n={n} {label} tile={tile} FAILED "
                          f"{str(e)[:80]}", flush=True)
            results[f"{label}_n{n}_gbs"] = round(best, 1)
            print(f"n={n} {label:12s} {best:6.1f} GB/s", flush=True)
    PC._MERGE = "tdot_rows"
    PC._pack_rows, PC._rows_recon = orig_pack, orig_recon
    PC._build.cache_clear()

    path = "BENCH_DETAILS.json"
    try:
        with open(path) as f:
            details = json.load(f)
    except FileNotFoundError:
        details = {}
    details["ordered_merge_ablation"] = results
    details["ordered_merge_ablation_note"] = (
        "tdot_rows stage ablation at N=1024/2048 (timing-only "
        "variants): the stride-c row interleave (_pack_rows) is the "
        "entire ordered-vs-unordered gap (~3%); blockrev and the "
        "mirror combos are free; retired digit/late merges are "
        "90-180 GB/s worse.  See tools/ordered_merge_ablation.py.")
    with open(path, "w") as f:
        json.dump(details, f, indent=2)
    print("merged into BENCH_DETAILS.json", file=sys.stderr)


if __name__ == "__main__":
    main()
