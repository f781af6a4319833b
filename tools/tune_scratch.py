#!/usr/bin/env python
"""Probe: ordered kernel where the packed-product interleave happens via
stores into a rank-3 VMEM scratch (128, c, T) whose flat (c*128, T) view
is already in merged row order — replacing the jnp.stack relayout.

Usage: python tools/tune_scratch.py [sizes...]
"""

import sys

sys.path.insert(0, ".")

PLANE_MB = 512


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.utils.prof_timing import device_time_ms

    sizes = [int(a) for a in sys.argv[1:]] or [1024, 2048, 4096]
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    force = jax.jit(lambda a: jnp.sum(jnp.abs(a[:1, :8])))

    def build(n, tile):
        c = n // 128
        consts = PC.const_arrays(n, False, "highest")
        t_re, t_im, m = consts[:3]

        def kernel(xr_ref, xi_ref, tr_ref, ti_ref, m_ref,
                   our_ref, oui_ref, scr_r, scr_i):
            xr, xi = xr_ref[:], xi_ref[:]
            mm = m_ref[:]
            pre, pim = PC._chunks(xr, c), PC._chunks(xi, c)
            pre, pim = PC._plane_dft_list(pre, pim, -1.0)
            for k2 in range(c):
                twr, twi = tr_ref[k2, :], ti_ref[k2, :]
                ar = pre[k2] * twr - pim[k2] * twi
                ai = pre[k2] * twi + pim[k2] * twr
                scr_r[:, k2, :] = PC._dot_t(mm, ar, "highest")
                scr_i[:, k2, :] = PC._dot_t(mm, ai, "highest")
            qr = jnp.transpose(scr_r[:].reshape(c * 128, tile))
            qi = jnp.transpose(scr_i[:].reshape(c * 128, tile))
            o_r, o_i = PC._late_recon(qr, qi, c)
            our_ref[:] = o_r
            oui_ref[:] = o_i

        spec = pl.BlockSpec((tile, n), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
        cspec = [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3

        @jax.jit
        def run(vr, vi):
            b = vr.shape[0]
            return pl.pallas_call(
                kernel, grid=(b // tile,),
                in_specs=[spec, spec] + cspec,
                out_specs=(spec, spec),
                out_shape=(jax.ShapeDtypeStruct((b, n), jnp.float32),) * 2,
                scratch_shapes=[
                    pltpu.VMEM((128, c, tile), jnp.float32),
                    pltpu.VMEM((128, c, tile), jnp.float32)],
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=100 * 1024 * 1024,
                    dimension_semantics=("arbitrary",)),
            )(vr, vi, jnp.asarray(t_re), jnp.asarray(t_im),
              jnp.asarray(m))
        return run

    # correctness on TPU first
    n0 = 1024
    rng = np.random.default_rng(0)
    x = (rng.random((256, n0)) + 1j * rng.random((256, n0))
         - .5 - .5j).astype(np.complex64)
    run = build(n0, 128)
    o_r, o_i = run(jnp.array(x.real.copy()), jnp.array(x.imag.copy()))
    got = np.asarray(o_r) + 1j * np.asarray(o_i)
    ref = np.fft.fft(x.astype(np.complex128))
    print(f"scratch-store correctness n={n0}: "
          f"{np.max(np.abs(got - ref)):.3e}", flush=True)

    def devdata(rows, cols, seed):
        return jax.jit(lambda: jax.random.uniform(
            jax.random.PRNGKey(seed), (rows, cols), jnp.float32,
            -0.5, 0.5))()

    for n in sizes:
        rows = 1 << ((PLANE_MB * 2 ** 20 // (n * 4)).bit_length() - 1)
        vr, vi = devdata(rows, n, 11), devdata(rows, n, 12)
        nbytes = 4 * rows * n * 4
        for tile in (128, 256, 512):
            try:
                run = build(n, tile)

                def fsync():
                    out = run(vr, vi)
                    float(force(out[0]))
                ms = device_time_ms(fsync, reps=5, match=r"^jit_run")
                print(f"n={n:5d} scratch t{tile:3d}: {ms:7.3f} ms  "
                      f"{nbytes/ms/1e6:6.1f} GB/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"n={n:5d} scratch t{tile:3d}: FAILED {str(e)[:90]}",
                      flush=True)


if __name__ == "__main__":
    main()
