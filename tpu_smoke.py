#!/usr/bin/env python
"""On-TPU Mosaic compilation + correctness smoke test.

The CPU test suite runs the kernels through the Pallas interpreter, which
accepts some primitives Mosaic cannot lower (e.g. lax.rev) — so a Mosaic
regression can pass CI silently (VERDICT r1, weak #9).  This script
compiles and runs every fused kernel family ON THE ATTACHED TPU and
verifies against numpy.fft in float64:

  c2c forward ordered/unordered + inverse + relayout-free roundtrip,
  r2c fused, c2r fused, multiple (in-VMEM reuse), every precision mode,
  plus the pencil-layout reuse kernel (ops/pencil.py).

Run via the verify skill each round; commit the PASSED transcript to
TPU_SMOKE.txt.  Exit code 0 = all pass.
"""

import sys

import numpy as np


def tol(n, prec):
    base = {"highest": 2e-7, "high": 2e-7, "fast": 4e-6}[prec]
    return base * n ** 0.75 * 8


def main():
    from smfft_tpu.utils.compile_cache import enable as _enable_cache
    _enable_cache()
    import jax
    import jax.numpy as jnp
    import smfft_tpu as S
    from smfft_tpu.ops import pallas_c2c as PC
    from smfft_tpu.ops import pallas_real as PR

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({jax.default_backend()})")
    if jax.default_backend() != "tpu":
        print("WARNING: not a TPU — smoke is only meaningful on Mosaic")
    rng = np.random.default_rng(42)
    failures = 0

    def check(name, err, bound):
        nonlocal failures
        ok = err < bound
        failures += 0 if ok else 1
        print(f"{'PASS' if ok else 'FAIL'} {name}: err {err:.3e} "
              f"(bound {bound:.3e})")

    for prec in ("highest", "fast"):
        for n in (32, 64, 128, 256, 1024, 4096, 8192, 16384):
            x = (rng.random((64, n)) + 1j * rng.random((64, n))
                 - 0.5 - 0.5j).astype(np.complex64)
            vr = jnp.array(np.ascontiguousarray(x.real))
            vi = jnp.array(np.ascontiguousarray(x.imag))
            ref = np.fft.fft(x.astype(np.complex128))
            c = max(1, n // 128)
            ncols = max(n, 128)
            rows = 64 * n // ncols
            vr2, vi2 = vr.reshape(rows, ncols), vi.reshape(rows, ncols)
            # unordered external
            o_r, o_i = PC.fft_planar(vr2, vi2, n, precision=prec)
            got = (np.asarray(o_r) + 1j * np.asarray(o_i)).reshape(-1, n)
            if c > 1:
                got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(
                    -1, n)
            check(f"c2c unordered n={n} {prec}",
                  np.max(np.abs(got - ref)), tol(n, prec))
            # ordered
            o_r, o_i = PC.fft_planar(vr2, vi2, n, precision=prec,
                                     ordered=True)
            got = (np.asarray(o_r) + 1j * np.asarray(o_i)).reshape(-1, n)
            check(f"c2c ordered   n={n} {prec}",
                  np.max(np.abs(got - ref)), tol(n, prec))
            # inverse + relayout-free roundtrip
            u_r, u_i = PC.fft_planar(vr2, vi2, n, precision=prec)
            b_r, b_i = PC.fft_planar(u_r, u_i, n, rev_in=True,
                                     inverse=True, precision=prec)
            back = ((np.asarray(b_r) + 1j * np.asarray(b_i)) / n
                    ).reshape(-1, n)
            check(f"c2c roundtrip n={n} {prec}",
                  np.max(np.abs(back - x.reshape(-1, n))),
                  tol(n, prec))
            # multiple (reuse) path compiles + runs finite
            m_r, _ = PC.fft_planar(vr2, vi2, n, precision=prec,
                                   multiple_iters=3)
            assert np.all(np.isfinite(np.asarray(m_r))), "multiple NaN"
        for n in (256, 512, 2048, 8192, 16384):
            xr = (rng.random((64, n)) * 2 - 1).astype(np.float32)
            spec_ref = np.fft.rfft(xr.astype(np.float64))
            o_r, o_i = PR.rfft_fused_planar(jnp.array(xr), precision=prec)
            got = np.asarray(o_r) + 1j * np.asarray(o_i)
            L = n // 2
            c = L // 128
            nat = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(-1, L) \
                if c > 1 else got
            full = np.concatenate(
                [np.real(nat[:, :1]), nat[:, 1:],
                 np.imag(nat[:, :1])], axis=1)
            full[:, 0] = np.real(nat[:, 0])
            check(f"r2c fused     n={n} {prec}",
                  np.max(np.abs(full - spec_ref)), tol(n, prec))
            # c2r: revblock packed spectrum -> signal * L
            back = np.asarray(PR.irfft_fused_planar(o_r, o_i, n,
                                                    precision=prec)) / L
            check(f"c2r fused     n={n} {prec}",
                  np.max(np.abs(back - xr)), tol(n, prec))

    # "exact" tier (split-accumulation lane dot): <= 2 output ulp at
    # max magnitude — tighter than any n^0.75 bound (VERDICT r4 #5)
    for n in (1024, 4096):
        x = (rng.random((64, n)) + 1j * rng.random((64, n))
             - 0.5 - 0.5j).astype(np.complex64)
        vr = jnp.array(np.ascontiguousarray(x.real))
        vi = jnp.array(np.ascontiguousarray(x.imag))
        ref = np.fft.fft(x.astype(np.complex128))
        c = n // 128
        o_r, o_i = PC.fft_planar(vr, vi, n, precision="exact")
        got = (np.asarray(o_r) + 1j * np.asarray(o_i)).reshape(
            -1, c, 128).transpose(0, 2, 1).reshape(-1, n)
        ulp = float(np.spacing(np.float32(np.max(np.abs(ref)))))
        check(f"c2c exact     n={n}", np.max(np.abs(got - ref)), 2 * ulp)

    # pencil-layout fused real transforms, natural order (the product
    # ordered path for 256 <= n <= 4096)
    from smfft_tpu.ops import pencil as PEN
    for n in (256, 1024, 4096):
        xr = (rng.random((1024, n)) * 2 - 1).astype(np.float32)
        o_r, o_i = PEN.rfft_pencil_planar(jnp.array(xr))
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        ref = np.fft.rfft(xr.astype(np.float64))
        full = np.concatenate(
            [np.real(got[:, :1]), got[:, 1:], np.imag(got[:, :1])], axis=1)
        full[:, 0] = np.real(got[:, 0])
        check(f"r2c pencil    n={n} highest",
              np.max(np.abs(full - ref)), tol(n, "highest"))
        back = np.asarray(PEN.irfft_pencil_planar(o_r, o_i, n)) / (n // 2)
        check(f"c2r pencil rt n={n} highest",
              np.max(np.abs(back - xr)), tol(n, "highest"))

    # composed user kernel: FFT -> per-frequency filter -> IFFT entirely
    # in VMEM via the public pencil emitters (the reference's __device__
    # in-kernel-use story, README.md:10), Mosaic-compiled
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from smfft_tpu.ops import pencil as PEN
    n = 256
    h = (rng.random(n) - 0.5).astype(np.float32)
    hf = np.fft.fft(h.astype(np.complex128))
    hr = [float(v) for v in hf.real]
    hi = [float(v) for v in hf.imag]

    def conv_kernel(x_ref, o_ref):
        br = PEN.to_pencil(x_ref[:], n)
        bi = jnp.zeros_like(br)
        fr, fi = PEN.plane_fft(PEN.planes(br, n), PEN.planes(bi, n))
        gr = [fr[k] * hr[k] - fi[k] * hi[k] for k in range(n)]
        gi = [fr[k] * hi[k] + fi[k] * hr[k] for k in range(n)]
        brr, _ = PEN.plane_fft(gr, gi, inverse=True)
        o_ref[:] = PEN.from_pencil(
            jnp.concatenate(brr, axis=0), n) * np.float32(1.0 / n)

    x = (rng.random((1024, n)) - 0.5).astype(np.float32)
    spec = pl.BlockSpec((1024, n), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out = jax.jit(lambda v: pl.pallas_call(
        conv_kernel, grid=(1,), in_specs=[spec], out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((1024, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024),
    )(v))(jnp.array(x))
    ref = np.real(np.fft.ifft(np.fft.fft(x.astype(np.complex128)) * hf))
    check("composed conv kernel n=256", np.max(np.abs(np.asarray(out) - ref)),
          1e-3)

    # pencil-layout in-VMEM reuse kernel (Mosaic path)
    for n in (32, 256, 1024, 4096):
        x = (rng.random((1024, n)) + 1j * rng.random((1024, n))
             - 0.5 - 0.5j).astype(np.complex64)
        ref = np.fft.fft(x.astype(np.complex128))
        o_r, o_i = PEN.multiple_pencil_planar(
            jnp.array(np.ascontiguousarray(x.real)),
            jnp.array(np.ascontiguousarray(x.imag)), n, iters=1)
        got = (np.asarray(o_r) + 1j * np.asarray(o_i)) * np.sqrt(n)
        check(f"pencil reuse  n={n} highest",
              np.max(np.abs(got - ref)), tol(n, "highest"))

    # round-3 additions: pair-rows real kernels, the size-adaptive
    # "high" tier's manual split schemes, and the real reuse loop —
    # every one must compile AND verify through Mosaic, not just the
    # interpreter.  A compile failure counts as a FAIL, not a crash.
    def guarded(name, fn):
        nonlocal failures
        try:
            fn()
        except Exception as e:  # noqa: BLE001
            failures += 1
            print(f"FAIL {name}: {str(e)[:110]}")

    from smfft_tpu.ops import real_direct as RD

    def pair_checks(n):
        L = n // 2
        xr = (rng.random((512, n)) * 2 - 1).astype(np.float32)
        o_r, o_i = RD.rfft_pair_planar(jnp.array(xr))
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        ref = np.fft.rfft(xr.astype(np.float64))
        full = np.concatenate(
            [np.real(got[:, :1]), got[:, 1:], np.imag(got[:, :1])],
            axis=1)
        full[:, 0] = np.real(got[:, 0])
        check(f"r2c pair      n={n} highest",
              np.max(np.abs(full - ref)), tol(n, "highest"))
        back = np.asarray(RD.irfft_pair_planar(o_r, o_i, n)) / L
        check(f"c2r pair rt   n={n} highest",
              np.max(np.abs(back - xr)), tol(n, "highest"))

    for n in (4096, 8192):
        guarded(f"pair kernels n={n}", lambda n=n: pair_checks(n))

    def high_check(n, scheme):
        x = (rng.random((256, n)) + 1j * rng.random((256, n))
             - 0.5 - 0.5j).astype(np.complex64)
        vr = jnp.array(np.ascontiguousarray(x.real))
        vi = jnp.array(np.ascontiguousarray(x.imag))
        o_r, o_i = PC.fft_planar(vr, vi, n, precision="high")
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        c = n // 128
        if c > 1:
            got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(
                -1, n)
        check(f"high tier ({scheme}) n={n}",
              np.max(np.abs(got - np.fft.fft(x.astype(np.complex128)))),
              1e-4)

    for n, scheme in ((256, "x4"), (512, "x5"), (128, "x3")):
        guarded(f"high tier n={n}", lambda n=n, s=scheme: high_check(n, s))

    def real_reuse_check(n):
        xr = (rng.random((1024, n)) - 0.5).astype(np.float32)
        out = np.asarray(PEN.multiple_real_pencil_planar(
            jnp.array(xr), n, iters=4))
        check(f"real reuse rt n={n}", np.max(np.abs(out - xr)), 1e-4)

    for n in (512, 2048):
        guarded(f"real reuse n={n}", lambda n=n: real_reuse_check(n))

    # fused convolution API (ops/convolve.py): FFT -> filter -> iFFT in
    # one Mosaic kernel
    from smfft_tpu.ops import convolve as CV

    def conv_check(n):
        x = (rng.random((256, max(n, 128))) + 1j
             * rng.random((256, max(n, 128))) - 0.5 - 0.5j
             ).astype(np.complex64)
        hf = (rng.random(n) + 1j * rng.random(n) - 0.5 - 0.5j
              ).astype(np.complex64)
        o_r, o_i = CV.convolve_planar(
            jnp.array(np.ascontiguousarray(x.real)),
            jnp.array(np.ascontiguousarray(x.imag)),
            jnp.array(hf.real), jnp.array(hf.imag), n)
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        xs = x.reshape(-1, n)
        ref = np.fft.ifft(np.fft.fft(xs.astype(np.complex128))
                          * hf.astype(np.complex128)).reshape(x.shape)
        check(f"fused convolve n={n}", np.max(np.abs(got - ref)),
              tol(n, "highest"))

    for n in (64, 1024, 4096):
        guarded(f"fused convolve n={n}", lambda n=n: conv_check(n))

    def conv_bank_check(n, m):
        x = (rng.random((256, n)) + 1j * rng.random((256, n))
             - 0.5 - 0.5j).astype(np.complex64)
        hf = (rng.random((m, n)) + 1j * rng.random((m, n)) - 0.5 - 0.5j
              ).astype(np.complex64)
        o_r, o_i = CV.convolve_bank_planar(
            jnp.array(np.ascontiguousarray(x.real)),
            jnp.array(np.ascontiguousarray(x.imag)),
            jnp.array(hf.real), jnp.array(hf.imag), n)
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        f = np.fft.fft(x.astype(np.complex128))
        err = max(np.max(np.abs(got[j] - np.fft.ifft(f * hf[j])))
                  for j in range(m))
        check(f"conv bank m={m} n={n}", err, tol(n, "highest"))

    guarded("conv bank", lambda: conv_bank_check(1024, 4))

    def conv_real_check(n):
        x = (rng.random((256, n)) * 2 - 1).astype(np.float32)
        ht = (rng.random(n) * 2 - 1).astype(np.float32)
        hf = np.fft.rfft(ht.astype(np.float64)).astype(np.complex64)
        out = np.asarray(CV.convolve_real_planar(
            jnp.array(x), jnp.array(hf.real), jnp.array(hf.imag), n))
        ref = np.fft.irfft(np.fft.rfft(x.astype(np.float64))
                           * np.fft.rfft(ht.astype(np.float64)), n)
        check(f"real convolve n={n}", np.max(np.abs(out - ref)),
              tol(n, "highest"))

    for n in (512, 4096):
        guarded(f"real convolve n={n}", lambda n=n: conv_real_check(n))

    def fftconvolve_check():
        t, k = 3000, 65
        x = (rng.random(t) * 2 - 1).astype(np.float32)
        ht = (rng.random(k) * 2 - 1).astype(np.float32)
        got = np.asarray(S.fftconvolve(jnp.array(x), jnp.array(ht)))
        ref = np.convolve(x.astype(np.float64), ht.astype(np.float64))
        check("fftconvolve stream", np.max(np.abs(got - ref)), 1e-3)

    guarded("fftconvolve", fftconvolve_check)

    def power_check(n):
        from smfft_tpu.ops import spectral as SP
        x = (rng.random((256, n)) * 2 - 1).astype(np.float32)
        w = np.hanning(n + 1)[:n].astype(np.float32)
        out = np.asarray(SP.power_pencil_planar(
            jnp.array(x), n, window=jnp.array(w)))
        spec = np.fft.rfft(x.astype(np.float64) * w)
        ref = np.abs(spec[:, :n // 2]) ** 2
        ref[:, 0] = spec[:, 0].real ** 2
        check(f"fused power n={n}",
              np.max(np.abs(out - ref)) / max(1.0, np.max(ref)),
              tol(n, "highest"))

    for n in (512, 2048):
        guarded(f"fused power n={n}", lambda n=n: power_check(n))

    def bluestein_check(n):
        from smfft_tpu.ops import chirp as CH
        m = max(32, 1 << (2 * n - 2).bit_length())
        np_pad = CH._n_pad(n)
        x = (rng.random((64, n)) * 2 - 1
             + 1j * (rng.random((64, n)) * 2 - 1)).astype(np.complex64)
        vr = np.zeros((64, np_pad), np.float32)
        vi = np.zeros((64, np_pad), np.float32)
        vr[:, :n], vi[:, :n] = x.real, x.imag
        o_r, o_i = CH.bluestein_planar(jnp.array(vr), jnp.array(vi), n, m)
        got = np.asarray(o_r)[:, :n] + 1j * np.asarray(o_i)[:, :n]
        ref = np.fft.fft(x.astype(np.complex128))
        check(f"fused bluestein n={n}", np.max(np.abs(got - ref)),
              tol(m, "highest") * 4)

    for n in (100, 1000):
        guarded(f"bluestein n={n}", lambda n=n: bluestein_check(n))

    def dct_check(n):
        import sys as _sys
        import smfft_tpu.dct  # noqa: F401
        D = _sys.modules["smfft_tpu.dct"]
        x = (rng.random((16, n)) * 2 - 1).astype(np.float32)
        got = np.asarray(D.dct(jnp.array(x), type=2))
        j = np.arange(n)
        M = 2.0 * np.cos(np.pi * np.outer(j, 2 * j + 1) / (2 * n))
        ref = x.astype(np.float64) @ M.T
        check(f"dct2 n={n}", np.max(np.abs(got - ref)) / np.sqrt(n),
              tol(n, "highest") * 4)
        rt = np.asarray(D.idct(D.dct(jnp.array(x), norm="ortho"),
                               norm="ortho"))
        check(f"dct roundtrip n={n}", np.max(np.abs(rt - x)),
              tol(n, "highest"))

    for n in (256, 1024):
        guarded(f"dct n={n}", lambda n=n: dct_check(n))

    def hilbert_check():
        n = 1024
        x = (rng.random((32, n)) * 2 - 1).astype(np.float32)
        from smfft_tpu.utils.transfer import from_device_complex
        got = from_device_complex(S.hilbert(jnp.array(x)))
        spec = np.fft.fft(x.astype(np.float64))
        m = np.zeros(n)
        m[0] = 1.0
        m[1:n // 2] = 2.0
        m[n // 2] = 1.0
        ref = np.fft.ifft(spec * m)
        check("hilbert n=1024", np.max(np.abs(got - ref)),
              tol(n, "highest") * 2)

    guarded("hilbert", hilbert_check)

    def resample_check():
        x = (rng.random((16, 500)) * 2 - 1).astype(np.float32)
        got = np.asarray(S.resample(jnp.array(x), 300))
        spec = np.fft.fft(x.astype(np.float64))
        y = np.zeros((16, 300), np.complex128)
        y[:, :151] = spec[:, :151]
        y[:, -149:] = spec[:, -149:]
        y[:, 150] += spec[:, -150]
        ref = np.fft.ifft(y).real * (300 / 500)
        check("resample 500->300", np.max(np.abs(got - ref)),
              tol(2048, "highest") * 2)

    guarded("resample", resample_check)

    def correlate_check():
        x = (rng.random(3000) * 2 - 1).astype(np.float32)
        h = (rng.random(65) * 2 - 1).astype(np.float32)
        got = np.asarray(S.fftcorrelate(jnp.array(x), jnp.array(h)))
        ref = np.correlate(x.astype(np.float64), h.astype(np.float64),
                           mode="full")
        check("fftcorrelate", np.max(np.abs(got - ref)), 1e-3)

    guarded("fftcorrelate", correlate_check)

    def rfft_any_check():
        n = 1000
        x = (rng.random((16, n)) * 2 - 1).astype(np.float32)
        from smfft_tpu.utils.transfer import from_device_complex
        got = from_device_complex(S.rfft_any(jnp.array(x)))
        ref = np.fft.rfft(x.astype(np.float64))
        check("rfft_any n=1000", np.max(np.abs(got - ref)),
              tol(2048, "highest") * 4)
        back = np.asarray(S.irfft_any(S.rfft_any(jnp.array(x)), n=n))
        check("irfft_any rt n=1000", np.max(np.abs(back - x)), 1e-3)

    guarded("rfft_any", rfft_any_check)

    def autodiff_check():
        from smfft_tpu import api
        n = 1024
        vr = jnp.array(rng.random((64, n)).astype(np.float32) - 0.5)
        vi = jnp.array(rng.random((64, n)).astype(np.float32) - 0.5)

        def loss(vr, vi):
            x = jax.lax.complex(vr, vi)
            return jnp.sum(jnp.abs(api.fft(x, backend="pallas")) ** 2)

        gr, gi = jax.jit(jax.grad(loss, argnums=(0, 1)))(vr, vi)
        # Parseval: sum |F x|^2 = n sum |x|^2, so grad = 2 n (vr, vi)
        err = (float(jnp.max(jnp.abs(gr - 2 * n * vr)))
               + float(jnp.max(jnp.abs(gi - 2 * n * vi)))) / (2 * n)
        check("fft grad-under-jit (Parseval)", err, tol(n, "highest"))

        xr = jnp.array(rng.random((32, 512)).astype(np.float32) - 0.5)
        g = jax.jit(jax.grad(lambda v: jnp.sum(jnp.abs(
            api.rfft(v, backend="pallas")) ** 2)))(xr)
        g_ref = jax.jit(jax.grad(lambda v: jnp.sum(jnp.abs(
            jnp.fft.rfft(v)) ** 2)))(xr)
        err_r = float(jnp.max(jnp.abs(g - g_ref))) / 1024.0
        check("rfft grad-under-jit", err_r, tol(512, "highest"))

    guarded("autodiff", autodiff_check)

    # huge-N families (round 4/5): rowfour single-pass, the hugefft
    # multi-pass pipeline under EVERY plan, the fused real split/merge,
    # and the public fft_large/rfft_large dispatch surface.  POLICY: no
    # kernel ships without a smoke line here — round 4 shipped two
    # device-broken kernels green behind interpret-only tests
    # (VERDICT r4 weak #2); a Mosaic compile failure below counts as a
    # FAIL, not a crash.
    from smfft_tpu import planar as PLA
    from smfft_tpu.ops import hugefft as HG
    from smfft_tpu.ops import rowfour as RFK

    def c2c_large_check(name, fn, n, b=8, bound=3e-6):
        xr = (rng.random((b, n)) * 2 - 1).astype(np.float32)
        xi = (rng.random((b, n)) * 2 - 1).astype(np.float32)
        o_r, o_i = fn(jnp.asarray(xr), jnp.asarray(xi))
        got = np.asarray(o_r) + 1j * np.asarray(o_i)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        check(name, np.max(np.abs(got - ref)) / np.max(np.abs(ref)),
              bound)

    for n in (1 << 15, 1 << 17):
        guarded(f"rowfour n=2^{n.bit_length() - 1}",
                lambda n=n: c2c_large_check(
                    f"rowfour 1-pass n=2^{n.bit_length() - 1}",
                    RFK.fft_rowfour_planar, n))
    guarded("rowfour reuse", lambda: c2c_large_check(
        "rowfour reuse x3 n=2^15",
        lambda a, b: RFK.fft_rowfour_planar(
            *RFK.fft_rowfour_planar(a, b, multiple_iters=3),
            inverse=True, scale=1.0 / (1 << 15)), 1 << 15, bound=1e10))
    for plan, e, b in (("two:revisit", 18, 8), ("two:fold", 20, 8),
                       ("three", 22, 8), ("five", 25, 2)):
        guarded(f"hugefft {plan} 2^{e}",
                lambda plan=plan, e=e, b=b: c2c_large_check(
                    f"hugefft {plan} n=2^{e}",
                    lambda a, c: HG.fft_huge_planar(a, c, plan=plan),
                    1 << e, b=b))

    def real_large_check(e, b=4, mode=None):
        from smfft_tpu.ops import real_fused as RFU
        n = 1 << e
        tag = f" [{mode}]" if mode else ""
        xr = (rng.random((b, n)) * 2 - 1).astype(np.float32)
        if mode is None:
            hr, hi = PLA.rfft_large(jnp.asarray(xr))
        else:
            hr, hi = RFU.rfft_large_planar(jnp.asarray(xr), mode=mode)
        got = np.asarray(hr) + 1j * np.asarray(hi)
        ref = np.fft.rfft(xr.astype(np.float64))
        full = np.concatenate([got[:, :1].real, got[:, 1:]], axis=-1)
        e_body = np.max(np.abs(full[:, 1:] - ref[:, 1:-1]))
        e_dc = np.max(np.abs(got[:, 0].real - ref[:, 0].real))
        e_ny = np.max(np.abs(got[:, 0].imag - ref[:, -1].real))
        check(f"rfft_large n=2^{e}{tag}",
              max(e_body, e_dc, e_ny) / np.max(np.abs(ref)), 3e-6)
        if mode is None:
            back = np.asarray(PLA.irfft_large(hr, hi, n))
        else:
            back = np.asarray(RFU.irfft_large_planar(hr, hi, n, mode=mode))
        check(f"irfft_large rt n=2^{e}{tag}", np.max(np.abs(back - xr)),
              1e-5)

    # default dispatch (batch-pair) at three size classes + one line per
    # explicit mode so both split designs keep device coverage
    for e in (16, 20, 23):
        guarded(f"real_fused 2^{e}", lambda e=e: real_large_check(e))
    guarded("real_fused pair 2^18",
            lambda: real_large_check(18, mode="pair"))
    guarded("real_fused halfc 2^18",
            lambda: real_large_check(18, mode="halfc"))
    guarded("fft_large dispatch 2^19", lambda: c2c_large_check(
        "fft_large (public) n=2^19", PLA.fft_large, 1 << 19))

    def planar_api_check():
        from smfft_tpu import planar
        x = (rng.random((32, 1024)) * 2 - 1
             + 1j * (rng.random((32, 1024)) * 2 - 1)).astype(np.complex64)
        fr, fi = planar.fft(jnp.array(np.ascontiguousarray(x.real)),
                            jnp.array(np.ascontiguousarray(x.imag)))
        got = np.asarray(fr) + 1j * np.asarray(fi)
        ref = np.fft.fft(x.astype(np.complex128))
        check("planar.fft n=1024", np.max(np.abs(got - ref)),
              tol(1024, "highest"))

    guarded("planar api", planar_api_check)

    print(f"{'ALL PASSED' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
