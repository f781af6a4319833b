"""R2C/C2R Pallas-path tests (interpreter mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

import smfft_tpu.ops.pallas_c2c as PC
import smfft_tpu.ops.pallas_real as PR
from smfft_tpu.params import SUPPORTED_REAL_SIZES

from conftest import max_abs_err


@pytest.fixture(autouse=True, scope="module")
def interpret_mode():
    PC.set_interpret(True)
    yield
    PC.set_interpret(False)


def tol(n):
    return 5e-7 * n ** 0.75 * 8


@pytest.mark.parametrize("n", SUPPORTED_REAL_SIZES)
def test_rfft_numpy_layout(rng, n):
    rows = 128 if n <= 8192 else 16  # interpreter cost at half-size 8192
    x = (rng.random((rows, n)) - 0.5).astype(np.float32)
    got = np.asarray(PR.rfft_pallas(jnp.array(x)))
    assert got.shape == (rows, n // 2 + 1)
    assert max_abs_err(got, np.fft.rfft(x.astype(np.float64))) < tol(n)


@pytest.mark.parametrize("n", [256, 2048, 8192])
def test_rfft_packed_layout(rng, n):
    """Packed slot-0 = (DC, Nyquist) contract
    (reference FFT-GPU-32bit-Stockham.cu:332-340, FFT.c:136-143)."""
    x = (rng.random((128, n)) - 0.5).astype(np.float32)
    got = np.asarray(PR.rfft_pallas(jnp.array(x), packed=True))
    ref = np.fft.rfft(x.astype(np.float64))
    assert got.shape == (128, n // 2)
    assert max_abs_err(got[..., 0].real, ref[..., 0].real) < tol(n)
    assert max_abs_err(got[..., 0].imag, ref[..., n // 2].real) < tol(n)
    assert max_abs_err(got[..., 1:], ref[..., 1:n // 2]) < tol(n)


@pytest.mark.parametrize("n", [256, 1024])
@pytest.mark.parametrize("packed", [False, True])
def test_c2r_unnormalized_roundtrip(rng, n, packed):
    """C2R(R2C(x)) == (N/2) * x — the reference's disabled TEST_C2R promoted
    to a real test (FFT-GPU-32bit-Stockham.cu:595-623)."""
    x = (rng.random((128, n)) - 0.5).astype(np.float32)
    spec = PR.rfft_pallas(jnp.array(x), packed=packed)
    back = np.asarray(PR.irfft_pallas(spec, n, packed=packed)) / (n // 2)
    assert max_abs_err(back, x) < tol(n)


def test_irfft_from_numpy_spectrum(rng):
    n = 512
    x = (rng.random((128, n)) - 0.5).astype(np.float32)
    spec = np.fft.rfft(x.astype(np.float64)).astype(np.complex64)
    got = np.asarray(PR.irfft_pallas(jnp.array(spec), n)) / (n // 2)
    assert max_abs_err(got, x) < tol(n)


def test_wrong_real_length():
    with pytest.raises(ValueError, match="wrong FFT length"):
        PR.rfft_pallas(jnp.zeros((4, 48), jnp.float32))


@pytest.mark.parametrize("n", [256, 512, 1024, 4096, 8192])
def test_rfft_fused_numpy_layout(rng, n):
    """The fully-fused single-pass R2C kernel (deinterleave + half-size
    core + matmul-folded split) vs numpy."""
    x = (rng.random((64, n)) - 0.5).astype(np.float32)
    got = np.asarray(PR.rfft_pallas_fused(jnp.array(x)))
    assert got.shape == (64, n // 2 + 1)
    assert max_abs_err(got, np.fft.rfft(x.astype(np.float64))) < tol(n)


def test_rfft_fused_packed(rng):
    n = 1024
    x = (rng.random((64, n)) - 0.5).astype(np.float32)
    got = np.asarray(PR.rfft_pallas_fused(jnp.array(x), packed=True))
    ref = np.fft.rfft(x.astype(np.float64))
    assert max_abs_err(got[..., 0].real, ref[..., 0].real) < tol(n)
    assert max_abs_err(got[..., 0].imag, ref[..., n // 2].real) < tol(n)
    assert max_abs_err(got[..., 1:], ref[..., 1:n // 2]) < tol(n)


def test_rfft_fused_small_sizes_rejected():
    with pytest.raises(ValueError, match="rfft_fused requires"):
        PR.rfft_fused_planar(jnp.zeros((8, 128), jnp.float32))


@pytest.mark.parametrize("n", [256, 512, 1024, 4096])
def test_irfft_fused_roundtrip(rng, n):
    """Relayout-free real roundtrip: rfft_fused |> irfft_fused == (n/2)*x
    with both sides in the packed revblock layout (TEST_C2R promoted,
    FFT-GPU-32bit-Stockham.cu:595-623)."""
    x = (rng.random((64, n)) - 0.5).astype(np.float32)
    o_r, o_i = PR.rfft_fused_planar(jnp.array(x))
    back = np.asarray(PR.irfft_fused_planar(o_r, o_i, n)) / (n // 2)
    assert max_abs_err(back, x) < tol(n)


def test_irfft_fused_from_numpy_spectrum(rng):
    """Fused C2R fed a numpy-computed spectrum (converted to the packed
    revblock layout) reproduces the signal."""
    n, L = 1024, 512
    c = L // 128
    x = (rng.random((64, n)) - 0.5).astype(np.float32)
    full = np.fft.rfft(x.astype(np.float64))
    packed = np.concatenate(
        [full[:, :1].real + 1j * full[:, L:L + 1].real, full[:, 1:L]],
        axis=1).astype(np.complex64)
    # natural packed -> revblock: rev[k2*128 + k1] = packed[k1*c + k2]
    rev = packed.reshape(-1, 128, c).transpose(0, 2, 1).reshape(-1, L)
    back = np.asarray(PR.irfft_fused_planar(
        jnp.array(np.ascontiguousarray(rev.real)),
        jnp.array(np.ascontiguousarray(rev.imag)), n)) / (n // 2)
    assert max_abs_err(back, x) < tol(n)
