"""Error attribution for the fused c2c chain at n = 1024..4096.

Replicates emit_fft's stage structure (sublane plane DFT over chunks ->
main twiddle -> packed lane DFT_128) in numpy with a per-stage precision
toggle, so each rounding source can be isolated:

  stages: plane (the chunk-list radix ladder), tw (the (C,128) twiddle
  table + product), lane (the 128-point matmul + mirror recon adds).

Usage: probe_accuracy_attrib.py   (pure numpy, no jax)
"""
import sys
import itertools
import math
import numpy as np

LANES = 128


def w_scalar(sign, k, c):
    ang = sign * 2.0 * math.pi * k / c
    return math.cos(ang), math.sin(ang)


def plane_dft(chunks, sign, dt):
    """Recursive radix-8/4/2 DIT over a python list of (T,128) complex
    numpy arrays, rounding every intermediate to dt (complex64/128)."""
    c = len(chunks)
    if c == 1:
        return chunks
    r = 8 if c % 8 == 0 else (4 if c % 4 == 0 else 2)
    sub = [plane_dft(chunks[j::r], sign, dt) for j in range(r)]
    q = c // r
    out = [None] * c
    for k in range(q):
        t = []
        for j in range(r):
            wr, wi = w_scalar(sign, j * k, c)
            w = dt(complex(np.float32(wr), np.float32(wi))) if dt == np.complex64 \
                else complex(wr, wi)
            t.append((sub[j][k] * w).astype(dt))
        # r-point DFT of t (direct, rounding per add)
        for m in range(r):
            acc = t[0]
            for j in range(1, r):
                wr, wi = w_scalar(sign, j * m, r)
                acc = (acc + t[j] * dt(complex(wr, wi))).astype(dt)
            out[k + m * q] = acc
    return out


def run_chain(x, prec):
    """x: (T, n) complex128 input; prec: dict stage->np dtype."""
    T, n = x.shape
    c = n // LANES
    sign = -1.0
    # chunk views
    ch = [x[:, j * LANES:(j + 1) * LANES] for j in range(c)]
    ch = [a.astype(prec["plane"]) for a in ch]
    ch = plane_dft(ch, sign, prec["plane"])
    # main twiddle  w_n^{k2*n1}
    dt = prec["tw"]
    k1 = np.arange(LANES)
    for k2 in range(c):
        w = np.exp(sign * 2j * np.pi * k2 * k1 / n)
        if dt == np.complex64:
            w = w.astype(np.complex64)
        ch[k2] = (ch[k2].astype(dt) * w).astype(dt)
    # lane DFT_128 (plain matmul in dt) per chunk
    dt = prec["lane"]
    f = np.exp(sign * 2j * np.pi * np.outer(k1, k1) / LANES)
    if dt == np.complex64:
        f = f.astype(np.complex64)
    out = np.empty((T, n), np.complex128)
    for k2 in range(c):
        z = (ch[k2].astype(dt) @ f.astype(dt)).astype(dt)
        # revblock: lane k1 of chunk k2 = X[k1*c + k2]
        out[:, k1 * c + k2] = z
    return out


def main():
    rng = np.random.default_rng(7)
    for n in (1024, 4096):
        x = (rng.random((64, n)) + 1j * rng.random((64, n))
             - 0.5 - 0.5j).astype(np.complex64).astype(np.complex128)
        ref = np.fft.fft(x)
        print(f"n={n}  max|ref|={np.max(np.abs(ref)):.1f}")
        c64, c128 = np.complex64, np.complex128
        for combo in itertools.product((c64, c128), repeat=3):
            prec = dict(zip(("plane", "tw", "lane"), combo))
            got = run_chain(x, prec)
            err = np.max(np.abs(got - ref))
            tag = "".join("S" if d == c64 else "D" for d in combo)
            print(f"  plane/tw/lane={tag}: abs err {err:.3e}")


if __name__ == "__main__":
    main()
