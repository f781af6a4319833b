"""Fused huge-N real transforms (ops/real_fused.py): the Pallas
Hermitian split/merge passes and the planar rfft_large/irfft_large
surface, via the Pallas interpreter on CPU."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smfft_tpu import planar
from smfft_tpu.ops import pallas_c2c as PC
from smfft_tpu.ops import real_fused as RF

from conftest import max_abs_err


@pytest.fixture
def interpret():
    PC.set_interpret(True)
    try:
        yield
    finally:
        PC.set_interpret(False)


def _pack_oracle(x):
    """numpy rfft -> the reference packed layout (slot 0 = DC + i*Nyq)."""
    w = np.fft.rfft(x.astype(np.float64))
    packed = w[..., :-1].copy()
    packed[..., 0] = w[..., 0].real + 1j * w[..., -1].real
    return packed


def test_split_pass_matches_oracle(rng, interpret):
    """Forward Hermitian split pass alone on a numpy-computed Z."""
    n = 1 << 15
    L = n // 2
    x = (rng.random((8, n)) - 0.5).astype(np.float32)
    z = x.reshape(8, L, 2)
    Z = np.fft.fft(z[..., 0] + 1j * z[..., 1])
    t = RF._split_tile(L)
    hr, hi = RF._build_split(n, 8, t, False)(
        jnp.asarray(Z.real.astype(np.float32)),
        jnp.asarray(Z.imag.astype(np.float32)))
    got = np.asarray(hr) + 1j * np.asarray(hi)
    want = _pack_oracle(x)
    scale = np.max(np.abs(want))
    assert np.max(np.abs(got - want)) / scale < 2e-6


def test_merge_pass_inverts_split(rng, interpret):
    """Merge pass + numpy half-size inverse recovers the signal."""
    n = 1 << 15
    L = n // 2
    x = (rng.random((8, n)) - 0.5).astype(np.float32)
    want = _pack_oracle(x).astype(np.complex64)
    t = RF._split_tile(L)
    zr, zi = RF._build_split(n, 8, t, True)(
        jnp.asarray(want.real.astype(np.float32)),
        jnp.asarray(want.imag.astype(np.float32)))
    zb = np.fft.ifft(np.asarray(zr) + 1j * np.asarray(zi))  # = z / L * L
    back = np.stack([zb.real, zb.imag], axis=-1).reshape(8, n)
    assert np.max(np.abs(back - x)) < 1e-5


def test_lane_reverse_exact(rng, interpret):
    """The bf16x3 permutation-matmul lane reversal is bit-exact."""
    from jax.experimental import pallas as pl
    x = rng.standard_normal((8, 512)).astype(np.float32) * 1e3

    def kernel(x_ref, r_ref, o_ref):
        o_ref[:] = RF._lane_reverse(x_ref[:], r_ref[:], 512)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 512), jnp.float32),
        interpret=True,
    )(jnp.asarray(x), jnp.asarray(RF._rev128_bf16()))
    assert np.array_equal(np.asarray(out), x[:, ::-1])


def test_planar_rfft_large_roundtrip(rng, interpret):
    """End-to-end planar rfft_large -> irfft_large at N = 2**15
    (half-size L = 16384 row kernel under the split passes)."""
    n = 1 << 15
    x = (rng.random((2, n)) - 0.5).astype(np.float32)
    hr, hi = planar.rfft_large(jnp.asarray(x))
    want = _pack_oracle(x)
    got = np.asarray(hr) + 1j * np.asarray(hi)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-6
    back = planar.irfft_large(hr, hi, n)
    assert max_abs_err(np.asarray(back), x) < 1e-5


def test_api_rfft_large_pallas_numpy_layout(rng, interpret):
    """Complex api surface (backend='pallas'), numpy (N/2+1) layout."""
    import smfft_tpu as S
    n = 1 << 15
    x = (rng.random(n) - 0.5).astype(np.float32)
    got = np.asarray(S.rfft_large(jnp.asarray(x), backend="pallas"))
    want = np.fft.rfft(x.astype(np.float64))
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-6
    back = S.irfft_large(jnp.asarray(got.astype(np.complex64)), n=n,
                         backend="pallas")
    assert max_abs_err(np.asarray(back), x) < 1e-5


def test_planar_rfft_large_rejects_bad_sizes(interpret):
    with pytest.raises(ValueError, match="wrong FFT length"):
        planar.rfft_large(jnp.zeros((2, 3 << 14), jnp.float32))


@pytest.mark.parametrize("b", [1, 2, 5])
def test_pair_split_roundtrip(rng, interpret, b):
    """Batch-pair path (the default): odd/even/singleton batches,
    forward vs the packed oracle, roundtrip in both normalize modes."""
    n = 1 << 15
    x = (rng.random((b, n)) - 0.5).astype(np.float32)
    hr, hi = RF.rfft_large_planar(jnp.asarray(x), mode="pair")
    got = np.asarray(hr) + 1j * np.asarray(hi)
    want = _pack_oracle(x)
    assert np.max(np.abs(got - want)) / np.max(np.abs(want)) < 2e-6
    back = RF.irfft_large_planar(hr, hi, n, mode="pair")
    assert np.max(np.abs(np.asarray(back) - x)) < 1e-5
    raw = RF.irfft_large_planar(hr, hi, n, normalize=False, mode="pair")
    assert np.max(np.abs(np.asarray(raw) - x * (n // 2))) / (n // 2) < 1e-5


def test_pair_matches_halfc(rng, interpret):
    """Both modes produce the same packed spectrum (up to fp32 noise)."""
    n = 1 << 15
    x = (rng.random((4, n)) - 0.5).astype(np.float32)
    pr, pi = RF.rfft_large_planar(jnp.asarray(x), mode="pair")
    qr, qi = RF.rfft_large_planar(jnp.asarray(x), mode="halfc")
    got_p = np.asarray(pr) + 1j * np.asarray(pi)
    got_q = np.asarray(qr) + 1j * np.asarray(qi)
    scale = np.max(np.abs(got_q))
    assert np.max(np.abs(got_p - got_q)) / scale < 2e-6
