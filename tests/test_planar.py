"""Public planar API (smfft_tpu.planar) vs the numpy.fft oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

import smfft_tpu.ops.pallas_c2c as PC
from smfft_tpu import planar


@pytest.fixture(autouse=True, scope="module")
def interpret_mode():
    PC.set_interpret(True)
    yield
    PC.set_interpret(False)


@pytest.fixture
def rng():
    return np.random.default_rng(9)


def c_of(pair):
    return np.asarray(pair[0]) + 1j * np.asarray(pair[1])


def test_fft_ifft_roundtrip_3d_batch(rng):
    x = (rng.random((2, 3, 512)) + 1j * rng.random((2, 3, 512))
         - 0.5 - 0.5j).astype(np.complex64)
    vr, vi = jnp.asarray(x.real), jnp.asarray(x.imag)
    fr, fi = planar.fft(vr, vi)
    got = c_of((fr, fi))
    want = np.fft.fft(x.astype(np.complex128))
    assert got.shape == x.shape
    assert np.max(np.abs(got - want)) < 1e-3
    br, bi = planar.ifft(fr, fi)
    assert np.max(np.abs(c_of((br, bi)) - x)) < 1e-4


def test_ifft_norm_none_unnormalized(rng):
    x = (rng.random((4, 256)) + 1j * rng.random((4, 256))
         - 0.5 - 0.5j).astype(np.complex64)
    fr, fi = planar.fft(jnp.asarray(x.real), jnp.asarray(x.imag))
    br, bi = planar.ifft(fr, fi, norm=None)
    assert np.max(np.abs(c_of((br, bi)) - 256 * x)) < 1e-2


def test_unordered_roundtrip(rng):
    x = (rng.random((8, 1024)) + 1j * rng.random((8, 1024))
         - 0.5 - 0.5j).astype(np.complex64)
    fr, fi = planar.fft(jnp.asarray(x.real), jnp.asarray(x.imag),
                        ordered=False)
    br, bi = planar.ifft_unordered(fr, fi)
    assert np.max(np.abs(c_of((br, bi)) - x)) < 1e-4


def test_rfft_irfft_packed_roundtrip(rng):
    x = (rng.random((5, 512)) - 0.5).astype(np.float32)
    hr, hi = planar.rfft(jnp.asarray(x))
    assert hr.shape == (5, 256)
    # packed natural layout: slot 0 = (DC, Nyquist)
    spec = np.fft.rfft(x.astype(np.float64))
    got = c_of((hr, hi))
    assert np.max(np.abs(got[:, 1:] - spec[:, 1:256])) < 1e-3
    assert np.max(np.abs(np.asarray(hr)[:, 0] - spec[:, 0].real)) < 1e-3
    assert np.max(np.abs(np.asarray(hi)[:, 0] - spec[:, 256].real)) < 1e-3
    y = planar.irfft(hr, hi)
    assert np.max(np.abs(np.asarray(y) - x)) < 1e-4


def test_convolve_matches_oracle(rng):
    n = 256
    x = (rng.random((6, n)) + 1j * rng.random((6, n))
         - 0.5 - 0.5j).astype(np.complex64)
    h = (rng.random(n) + 1j * rng.random(n) - 0.5 - 0.5j
         ).astype(np.complex64)
    o_r, o_i = planar.convolve(jnp.asarray(x.real), jnp.asarray(x.imag),
                               jnp.asarray(h.real), jnp.asarray(h.imag))
    want = np.fft.ifft(np.fft.fft(x.astype(np.complex128))
                       * h.astype(np.complex128))
    assert np.max(np.abs(c_of((o_r, o_i)) - want)) < 1e-4


def test_fft_any_planar(rng):
    n = 300
    np_pad = 384
    x = (rng.random((4, n)) + 1j * rng.random((4, n))
         - 0.5 - 0.5j).astype(np.complex64)
    vr = np.zeros((4, np_pad), np.float32)
    vi = np.zeros((4, np_pad), np.float32)
    vr[:, :n], vi[:, :n] = x.real, x.imag
    o_r, o_i = planar.fft_any(jnp.asarray(vr), jnp.asarray(vi), n=n)
    got = c_of((o_r, o_i))
    want = np.fft.fft(x.astype(np.complex128))
    assert np.max(np.abs(got[:, :n] - want)) < 1e-3
    assert np.max(np.abs(got[:, n:])) == 0.0


def test_shape_mismatch_raises():
    with pytest.raises(ValueError, match="planar pair"):
        planar.fft(jnp.zeros((2, 256)), jnp.zeros((3, 256)))


def test_wrong_length_raises():
    with pytest.raises(ValueError, match="wrong FFT length"):
        planar.fft(jnp.zeros((2, 100)), jnp.zeros((2, 100)))
    with pytest.raises(ValueError, match="wrong FFT length"):
        planar.rfft(jnp.zeros((2, 128)))
