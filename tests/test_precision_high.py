"""The "high" precision contract tier (VERDICT r2 weak #8 / next #6).

"high" is a CONTRACT (max abs error <= 1e-4 vs float64 numpy — the
reference's verification tolerance, SMFFT_CooleyTukey_C2C/FFT.c:12),
not a fixed pass scheme: pallas_c2c.resolve_scheme statically picks the
cheapest bf16 split scheme meeting the gate at each size (x3/x4/x5),
falling back to "highest" where no cheaper scheme exists (any < 6-pass
bf16 scheme carries a ~2^-18-relative dropped term, and transform
values grow ~sqrt(N), so N >= 1024 needs the full 6 passes — the
measured impossibility is documented in BASELINE.md).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import smfft_tpu.ops.pallas_c2c as PC
import smfft_tpu.ops.pallas_real as PR

from conftest import max_abs_err


@pytest.fixture(autouse=True, scope="module")
def interpret_mode():
    PC.set_interpret(True)
    yield
    PC.set_interpret(False)


def test_scheme_resolution_static():
    assert PC.resolve_scheme("high", 32) == "x3"
    assert PC.resolve_scheme("high", 256) == "x4"
    assert PC.resolve_scheme("high", 512) == "x5"
    assert PC.resolve_scheme("high", 1024) == "highest"
    assert PC.resolve_scheme("high", 8192) == "highest"
    # non-"high" tiers pass through untouched
    assert PC.resolve_scheme("fast", 4096) == "fast"
    assert PC.resolve_scheme("highest", 32) == "highest"
    # real transforms: one notch stricter (recombination amplification)
    assert PC.resolve_scheme_real("high", 128) == "x3"
    assert PC.resolve_scheme_real("high", 256) == "x5"
    assert PC.resolve_scheme_real("high", 512) == "highest"


def test_split3_is_exact():
    rng = np.random.default_rng(0)
    m = rng.standard_normal((128, 128)).astype(np.float32)
    h, mid, lo = PC._np_split_bf16_3(m)
    rec = (h.astype(np.float32) + mid.astype(np.float32)
           + lo.astype(np.float32))
    assert np.array_equal(rec, m)  # 3 x 8 mantissa bits cover fp32's 24


@pytest.mark.parametrize("n", [128, 256, 512, 2048])
def test_high_meets_gate_c2c(rng, n):
    """max abs err <= 1e-4 at every size, and the scheme is cheaper than
    highest wherever the table says so."""
    c = max(1, n // 128)
    x = (rng.random((256, n)) + 1j * rng.random((256, n))
         - 0.5 - 0.5j).astype(np.complex64)
    o_r, o_i = PC.fft_planar(jnp.array(x.real.copy()),
                             jnp.array(x.imag.copy()), n, precision="high")
    got = np.asarray(o_r) + 1j * np.asarray(o_i)
    if c > 1:
        got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(-1, n)
    err = max_abs_err(got, np.fft.fft(x.astype(np.complex128)))
    assert err < 1e-4, f"high tier over the 1e-4 gate at n={n}: {err:.2e}"


@pytest.mark.parametrize("n", [256, 512])
def test_high_meets_gate_r2c(rng, n):
    x = (rng.random((64, n)) - 0.5).astype(np.float32)
    # revblock fused path (the pencil natural path is pure fp32 anyway)
    o_r, o_i = PR.rfft_fused_planar(jnp.array(x), precision="high",
                                    ordered=False)
    got = np.asarray(o_r) + 1j * np.asarray(o_i)
    L = n // 2
    c = L // 128
    if c > 1:
        got = got.reshape(-1, c, 128).transpose(0, 2, 1).reshape(-1, L)
    ref = np.fft.rfft(x.astype(np.float64))
    err = max_abs_err(got[:, 1:], ref[:, 1:L])
    assert err < 1e-4, f"high r2c over gate at n={n}: {err:.2e}"


def test_high_distinct_from_highest_at_small_n(rng):
    """At n <= 512 "high" runs a genuinely different (cheaper) scheme —
    outputs differ from "highest" while both meet the gate."""
    n = 256
    x = (rng.random((64, n)) + 1j * rng.random((64, n))
         - 0.5 - 0.5j).astype(np.complex64)
    vr, vi = jnp.array(x.real.copy()), jnp.array(x.imag.copy())
    hi_r, _ = PC.fft_planar(vr, vi, n, precision="highest")
    h_r, _ = PC.fft_planar(vr, vi, n, precision="high")
    assert np.max(np.abs(np.asarray(hi_r) - np.asarray(h_r))) > 0.0
