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


def test_exact_scheme_resolution_static():
    assert PC.resolve_scheme("exact", 512) == "highest"
    assert PC.resolve_scheme("exact", 1024) == "acc16"
    assert PC.resolve_scheme("exact", 4096) == "acc16"
    assert PC.resolve_scheme_real("exact", 1024) == "highest"
    assert PC.resolve_scheme_real("exact", 2048) == "acc16"


@pytest.mark.parametrize("n", [1024, 4096])
def test_exact_beats_highest_c2c(rng, n):
    """The "exact" tier (split-accumulation lane dot, _acc_dot) must cut
    the dominant fp32-accumulator error: <= 2 output ulp at max
    magnitude, and at most ~60% of "highest"'s error on the same data.

    The measured floor: the lane accumulation shortened to depth
    16+log2(16) leaves ~1.6 ulp(max|X|) total — output fp32 rounding
    alone costs up to 0.5 ulp, so a 1e-5 abs gate at 4096 (~1.3 ulp)
    is below what ANY fp32-output transform can guarantee; the
    documented gate is 2 ulp (BASELINE.md accuracy section)."""
    c = n // 128
    x = (rng.random((64, n)) + 1j * rng.random((64, n))
         - 0.5 - 0.5j).astype(np.complex64)
    vr = jnp.array(np.ascontiguousarray(x.real))
    vi = jnp.array(np.ascontiguousarray(x.imag))
    ref = np.fft.fft(x.astype(np.complex128))

    def run(prec):
        o_r, o_i = PC.fft_planar(vr, vi, n, precision=prec)
        got = (np.asarray(o_r) + 1j * np.asarray(o_i)).reshape(
            -1, c, 128).transpose(0, 2, 1).reshape(-1, n)
        return np.max(np.abs(got - ref))

    e_hi, e_ex = run("highest"), run("exact")
    ulp = np.spacing(np.float32(np.max(np.abs(ref))))
    assert e_ex <= 2.0 * ulp
    assert e_ex <= 0.6 * e_hi


def test_exact_small_n_passthrough(rng):
    """Below EXACT_ACC_MIN the tier is bit-identical to "highest"."""
    n = 512
    x = (rng.random((32, n)) + 1j * rng.random((32, n))
         - 0.5 - 0.5j).astype(np.complex64)
    vr = jnp.array(np.ascontiguousarray(x.real))
    vi = jnp.array(np.ascontiguousarray(x.imag))
    a = PC.fft_planar(vr, vi, n, precision="highest")
    b = PC.fft_planar(vr, vi, n, precision="exact")
    assert np.array_equal(np.asarray(a[0]), np.asarray(b[0]))
    assert np.array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_exact_through_api(rng):
    """precision='exact' flows through the public fft/rfft surface."""
    import smfft_tpu as S
    n = 1024
    x = (rng.random(n) + 1j * rng.random(n) - 0.5 - 0.5j
         ).astype(np.complex64)
    got = np.asarray(S.fft(jnp.array(x), backend="pallas",
                           precision="exact"))
    ref = np.fft.fft(x.astype(np.complex128))
    assert np.max(np.abs(got - ref)) <= 1e-5
    xr = rng.standard_normal(2048).astype(np.float32)
    gr = np.asarray(S.rfft(jnp.array(xr), backend="pallas",
                           precision="exact"))
    rr = np.fft.rfft(xr.astype(np.float64))
    assert np.max(np.abs(gr - rr)) <= 2e-5
