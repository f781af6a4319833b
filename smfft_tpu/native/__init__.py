"""ctypes bindings for the native harness core (libsmfft_host.so).

Builds on demand via the bundled Makefile (g++); falls back to pure-numpy
implementations with identical semantics when no compiler is available, so
the Python package works everywhere while the native path serves the
big-batch verification runs (the reference's 4 GB compare loops are
host-side C for the same reason).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_LIB_PATH = _DIR / "libsmfft_host.so"
_lib = None
_tried = False


class CompareStats(ctypes.Structure):
    _fields_ = [
        ("total_error", ctypes.c_double),
        ("mean_error", ctypes.c_double),
        ("max_error", ctypes.c_double),
        ("error_count", ctypes.c_int64),
    ]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_DIR)], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.smfft_generate_uniform.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_uint64, ctypes.c_float,
        ctypes.c_float]
    lib.smfft_generate_two_tone.argtypes = [
        f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float]
    lib.smfft_compare.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(CompareStats)]
    lib.smfft_compare_r2c.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double,
        ctypes.POINTER(CompareStats)]
    lib.smfft_compare_real.argtypes = [
        f32p, f32p, ctypes.c_int64, ctypes.c_double, ctypes.c_double,
        ctypes.c_double, ctypes.POINTER(CompareStats)]
    _lib = lib
    return _lib


# ---------------------------------------------------------------------------
# Public helpers (native when available, numpy otherwise).
# ---------------------------------------------------------------------------


def _hybrid_error_np(got: np.ndarray, want: np.ndarray) -> np.ndarray:
    """The reference's error metric (get_error, FFT.c:23-49): absolute
    difference, decade-normalized where |want| > 10."""
    err = np.abs(want - got)
    mag = np.abs(want)
    big = mag > 10.0
    with np.errstate(divide="ignore"):
        decade = np.where(big, 10.0 ** np.floor(np.log10(
            np.where(big, mag, 1.0))), 1.0)
    return err / decade


def generate_uniform(count: int, seed: int, lo: float = -0.5,
                     hi: float = 0.5) -> np.ndarray:
    lib = get_lib()
    out = np.empty(count, np.float32)
    if lib is not None:
        lib.smfft_generate_uniform(out, count, seed, lo, hi)
        return out
    rng = np.random.default_rng(seed)
    return (lo + (hi - lo) * rng.random(count, dtype=np.float32))


def generate_two_tone(n_ffts: int, n: int, f1: float = 17.0, a1: float = 1.0,
                      f2: float = 41.0, a2: float = 0.5) -> np.ndarray:
    """The reference's Generate_signal (FFT.c:14-21), as a live fixture."""
    lib = get_lib()
    out = np.empty(n_ffts * n, np.float32)
    if lib is not None:
        lib.smfft_generate_two_tone(out, n_ffts, n, f1, a1, f2, a2)
        return out.reshape(n_ffts, n)
    i = np.arange(n)
    sig = (a1 * np.sin(2 * np.pi * f1 * i / n)
           + a2 * np.sin(2 * np.pi * f2 * i / n)).astype(np.float32)
    return np.broadcast_to(sig, (n_ffts, n)).copy()


def compare(got: np.ndarray, want: np.ndarray,
            tolerance: float = 1e-4) -> dict:
    """Element-wise complex compare with the reference's metric and
    tolerance default (max_error = 1e-4, FFT.c:12)."""
    got = np.ascontiguousarray(got, np.complex64).view(np.float32)
    wantc = np.ascontiguousarray(want, np.complex64).view(np.float32)
    lib = get_lib()
    if lib is not None:
        st = CompareStats()
        lib.smfft_compare(got.reshape(-1), wantc.reshape(-1),
                          got.size // 2, tolerance, ctypes.byref(st))
        return {"total_error": st.total_error, "mean_error": st.mean_error,
                "max_error": st.max_error, "error_count": int(st.error_count)}
    g = got.reshape(-1, 2)
    w = wantc.reshape(-1, 2)
    e = np.maximum(_hybrid_error_np(g[:, 0], w[:, 0]),
                   _hybrid_error_np(g[:, 1], w[:, 1]))
    return {"total_error": float(e.sum()), "mean_error": float(e.mean()),
            "max_error": float(e.max()), "error_count": int((e > tolerance).sum())}


def compare_r2c_packed(got_packed: np.ndarray, want_full: np.ndarray,
                       tolerance: float = 1e-4) -> dict:
    """Layout-aware packed-R2C compare (Compare_R2C_output, FFT.c:126-159)."""
    n_ffts, l = got_packed.shape
    got = np.ascontiguousarray(got_packed, np.complex64).view(np.float32)
    want = np.ascontiguousarray(want_full, np.complex64).view(np.float32)
    lib = get_lib()
    if lib is not None:
        st = CompareStats()
        lib.smfft_compare_r2c(got.reshape(-1), want.reshape(-1), n_ffts, l,
                              tolerance, ctypes.byref(st))
        return {"total_error": st.total_error, "mean_error": st.mean_error,
                "max_error": st.max_error, "error_count": int(st.error_count)}
    gp = got_packed
    wf = want_full
    e0 = np.maximum(_hybrid_error_np(gp[:, 0].real, wf[:, 0].real),
                    _hybrid_error_np(gp[:, 0].imag, wf[:, l].real))
    eb = np.maximum(_hybrid_error_np(gp[:, 1:].real, wf[:, 1:l].real),
                    _hybrid_error_np(gp[:, 1:].imag, wf[:, 1:l].imag))
    e = np.concatenate([e0[:, None], eb], axis=1)
    return {"total_error": float(e.sum()), "mean_error": float(e.mean()),
            "max_error": float(e.max()), "error_count": int((e > tolerance).sum())}


def compare_real(got: np.ndarray, want: np.ndarray, got_scale: float = 1.0,
                 want_scale: float = 1.0, tolerance: float = 1e-4) -> dict:
    """Normalized real-signal compare (Compare_C2R_output, FFT.c:161-185)."""
    got = np.ascontiguousarray(got, np.float32)
    want = np.ascontiguousarray(want, np.float32)
    lib = get_lib()
    if lib is not None:
        st = CompareStats()
        lib.smfft_compare_real(got.reshape(-1), want.reshape(-1), got.size,
                               got_scale, want_scale, tolerance,
                               ctypes.byref(st))
        return {"total_error": st.total_error, "mean_error": st.mean_error,
                "max_error": st.max_error, "error_count": int(st.error_count)}
    e = _hybrid_error_np(got.reshape(-1) / got_scale,
                         want.reshape(-1) / want_scale)
    return {"total_error": float(e.sum()), "mean_error": float(e.mean()),
            "max_error": float(e.max()), "error_count": int((e > tolerance).sum())}
