#!/usr/bin/env python
"""Device-timed stage ablation of the matmul r2c kernel (the path that
serves n >= 8192, and the candidate to beat the VPU-ladder-bound pencil
kernel at n = 4096).

Variants (WRONG RESULTS except 'full'): copy_only, no_deint (skip the
even/odd lane gathers), no_mirror (skip the mirror-spectrum build),
no_recomb (skip the P/Q recombination).

Measured on v5e at real n = 4096 (copy roofline 658):
full 424 / no_deint 550 / no_mirror 477 / no_recomb 488 — the
deinterleave gathers dominate, then recombination, then mirror.

Negative result recorded here: a gather-free two-pipeline "tdot"
redesign (M = DFT(conj z) as a second packed-dot pipeline whose ladder
state is a free chunk-permute+conj of Z's; row-domain recon; P/Q as
per-row tables with the packed slot folded in as P[0]=0, Q[0]=1+i —
algebra validates to 1e-13) measured only 226 GB/s with ~5 min Mosaic
compiles: the doubled packed dots are MXU-bound at the real transform's
8 B/point traffic.  The pencil kernel (465 GB/s at 4096) stays.

Usage: python tools/tune_real.py [real sizes...]
"""

import sys

sys.path.insert(0, ".")

PLANE_MB = 512


def main():
    import jax
    import jax.numpy as jnp
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.ops import pallas_real as PR
    from smfft_tpu.utils.prof_timing import device_time_ms

    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    for n in sizes:
        rows = 1 << ((PLANE_MB * 2 ** 20 // (n * 4)).bit_length() - 1)
        x = devdata(rows, n, 7)
        nbytes = rows * n * 8
        line = f"n={n:6d}"
        for ablate in ("", "copy_only", "no_deint", "no_mirror",
                       "no_recomb"):
            PC._ABLATE = ablate
            PR._build_rfft.cache_clear()
            try:
                def f():
                    out = PR.rfft_fused_planar(x)
                    float(force(out[0]))
                ms = device_time_ms(f, reps=5, match=r"^jit_run")
                line += f"  {ablate or 'full'}:{nbytes/ms/1e6:6.1f}"
            except Exception as e:  # noqa: BLE001
                line += f"  {ablate or 'full'}:FAIL({str(e)[:40]})"
            finally:
                PC._ABLATE = ""
                PR._build_rfft.cache_clear()
        print(line, flush=True)


if __name__ == "__main__":
    main()
