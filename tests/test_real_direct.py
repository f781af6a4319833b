"""Direct full-size real-transform kernels (ops/real_direct.py).

Reference parity targets: natural-order R2C/C2R with the packed
(DC, Nyquist) slot-0 layout and unnormalized L-scaled inverse
(SMFFT_Stockham_R2C_C2R/FFT-GPU-32bit-Stockham.cu:269-344, FFT.c:170-171)
— here computed directly at full length through the c2c two-factor
machinery instead of the half-size pack trick (no deinterleave, no
re-interleave; see the module docstring).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import smfft_tpu.ops.pallas_c2c as PC
from smfft_tpu.ops import real_direct as RD

from conftest import max_abs_err


@pytest.fixture(autouse=True, scope="module")
def interpret_mode():
    PC.set_interpret(True)
    yield
    PC.set_interpret(False)


@pytest.mark.parametrize("n", [1024, 2048])
def test_rfft_direct_matches_numpy(rng, n):
    L = n // 2
    x = (rng.random((16, n)) - 0.5).astype(np.float32)
    o_r, o_i = RD.rfft_direct_planar(jnp.array(x), tile_t=16)
    got = np.asarray(o_r) + 1j * np.asarray(o_i)
    ref = np.fft.rfft(x.astype(np.float64))
    assert max_abs_err(got[:, 0].real, ref[:, 0].real) < 1e-4   # DC
    assert max_abs_err(got[:, 0].imag, ref[:, L].real) < 1e-4   # Nyquist
    assert max_abs_err(got[:, 1:], ref[:, 1:L]) < 1e-4


def test_irfft_direct_matches_numpy(rng):
    """C2R against an independently-built numpy spectrum (not merely the
    roundtrip, which would mask a matching layout error in both)."""
    n, L = 1024, 512
    x = (rng.random((16, n)) - 0.5).astype(np.float64)
    spec = np.fft.rfft(x)
    pk = np.concatenate(
        [spec[:, :1].real + 1j * spec[:, L:L + 1].real, spec[:, 1:L]],
        axis=1).astype(np.complex64)
    out = np.asarray(RD.irfft_direct_planar(
        jnp.array(pk.real.copy()), jnp.array(pk.imag.copy()), n,
        tile_t=16))
    assert max_abs_err(out / L, x) < 1e-4   # reference L-scale contract


def test_roundtrip_and_padding(rng):
    n, L = 1024, 512
    x = (rng.random((13, n)) - 0.5).astype(np.float32)   # odd batch
    o_r, o_i = RD.rfft_direct_planar(jnp.array(x), tile_t=16)
    assert o_r.shape == (13, L)
    back = np.asarray(RD.irfft_direct_planar(o_r, o_i, n, tile_t=16)) / L
    assert max_abs_err(back, x) < 1e-4


@pytest.mark.parametrize("n", [1024, 2048])
def test_rfft_pair_matches_numpy(rng, n):
    """Pair-rows kernel: two real rows per complex pass with the
    row-domain Hermitian split — must be caller-invisible (row i of the
    output is the spectrum of row i)."""
    L = n // 2
    x = (rng.random((32, n)) - 0.5).astype(np.float32)
    o_r, o_i = RD.rfft_pair_planar(jnp.array(x), tile_t=16)
    got = np.asarray(o_r) + 1j * np.asarray(o_i)
    ref = np.fft.rfft(x.astype(np.float64))
    assert max_abs_err(got[:, 0].real, ref[:, 0].real) < 1e-4
    assert max_abs_err(got[:, 0].imag, ref[:, L].real) < 1e-4
    assert max_abs_err(got[:, 1:], ref[:, 1:L]) < 1e-4


def test_irfft_pair_matches_numpy(rng):
    n, L = 1024, 512
    x = (rng.random((32, n)) - 0.5).astype(np.float64)
    spec = np.fft.rfft(x)
    pk = np.concatenate(
        [spec[:, :1].real + 1j * spec[:, L:L + 1].real, spec[:, 1:L]],
        axis=1).astype(np.complex64)
    out = np.asarray(RD.irfft_pair_planar(
        jnp.array(pk.real.copy()), jnp.array(pk.imag.copy()), n,
        tile_t=16))
    assert max_abs_err(out / L, x) < 1e-4


def test_irfft_pair_lanes_form(rng):
    """The lane-domain assembly form (shipping at n = 4096/8192) — the
    _IRFFT_FORM table picks 'rows' at the small test sizes, so force
    'lanes' to keep the other kernel covered."""
    n, L = 1024, 512
    x = (rng.random((32, n)) - 0.5).astype(np.float64)
    spec = np.fft.rfft(x)
    pk = np.concatenate(
        [spec[:, :1].real + 1j * spec[:, L:L + 1].real, spec[:, 1:L]],
        axis=1).astype(np.complex64)
    old = RD._IRFFT_PAIR
    RD._IRFFT_PAIR = "lanes"
    try:
        out = np.asarray(RD.irfft_pair_planar(
            jnp.array(pk.real.copy()), jnp.array(pk.imag.copy()), n,
            tile_t=16))
    finally:
        RD._IRFFT_PAIR = old
    assert max_abs_err(out / L, x) < 1e-4


def test_pair_roundtrip_odd_batch(rng):
    n, L = 2048, 1024
    x = (rng.random((19, n)) - 0.5).astype(np.float32)
    o_r, o_i = RD.rfft_pair_planar(jnp.array(x), tile_t=16)
    assert o_r.shape == (19, L)
    back = np.asarray(RD.irfft_pair_planar(o_r, o_i, n, tile_t=16)) / L
    assert max_abs_err(back, x) < 1e-4


def test_bounds():
    with pytest.raises(ValueError, match="wrong FFT length"):
        RD.rfft_direct_planar(jnp.zeros((8, 512), jnp.float32))
    with pytest.raises(ValueError, match="wrong FFT length"):
        RD.irfft_direct_planar(jnp.zeros((8, 256), jnp.float32),
                               jnp.zeros((8, 256), jnp.float32), 512)
    assert not RD.supported(512)
    assert RD.supported(1024) and RD.supported(16384)
