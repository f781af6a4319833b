"""Pallas C2C kernel tests (interpreter mode on CPU; the same kernels
compile through Mosaic on TPU — see .claude/skills/verify for the on-chip
drive).  Covers kernel A (natural->revblock), kernel B (revblock->natural),
ordered epilogue, packing for N<128, the in-VMEM "multiple" loop, and the
fused-scale input."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import smfft_tpu.ops.pallas_c2c as PC
from smfft_tpu.params import SUPPORTED_C2C_SIZES

from conftest import max_abs_err


@pytest.fixture(autouse=True, scope="module")
def interpret_mode():
    PC.set_interpret(True)
    yield
    PC.set_interpret(False)


def rand_c(rng, b, n):
    return (rng.random((b, n)) + 1j * rng.random((b, n))
            - 0.5 - 0.5j).astype(np.complex64)


def tol(n):
    return 5e-7 * n ** 0.75 * 8


def to_dev(x):
    return jax.lax.complex(jnp.array(np.ascontiguousarray(x.real)),
                           jnp.array(np.ascontiguousarray(x.imag)))


@pytest.mark.parametrize("n", SUPPORTED_C2C_SIZES)
def test_forward_ordered(rng, n):
    x = rand_c(rng, 256, n)
    got = np.asarray(PC.fft_pallas(to_dev(x)))
    assert max_abs_err(got, np.fft.fft(x.astype(np.complex128))) < tol(n)


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_forward_revblock_layout(rng, n):
    """ordered=False output layout contract: out[k2*128+k1] = X[k1*C+k2]."""
    x = rand_c(rng, 64, n)
    u = np.asarray(PC.fft_pallas(to_dev(x), ordered=False))
    c = n // 128
    nat = u.reshape(-1, c, 128).transpose(0, 2, 1).reshape(-1, n)
    assert max_abs_err(nat, np.fft.fft(x.astype(np.complex128))) < tol(n)


@pytest.mark.parametrize("n", [32, 128, 512, 2048])
def test_inverse(rng, n):
    x = rand_c(rng, 256, n)
    got = np.asarray(PC.fft_pallas(to_dev(x), inverse=True))
    ref = np.fft.ifft(x.astype(np.complex128)) * n
    assert max_abs_err(got, ref) < tol(n)


@pytest.mark.parametrize("n", [256, 1024, 4096])
def test_relayout_free_roundtrip(rng, n):
    """fft(ordered=False) |> ifft_pallas_rev == N * x with zero reorder
    passes — the convolution-pipeline pair (fft_reorder=0 analogue)."""
    x = rand_c(rng, 64, n)
    u = PC.fft_pallas(to_dev(x), ordered=False)
    back = np.asarray(PC.ifft_pallas_rev(u)) / n
    assert max_abs_err(back, x) < tol(n)


def test_packing_divisibility():
    with pytest.raises(ValueError, match="multiple of 4"):
        PC.fft_pallas(jnp.zeros((3, 32), jnp.complex64))
    with pytest.raises(ValueError, match="multiple of 2"):
        PC.fft_pallas(jnp.zeros((3, 64), jnp.complex64))


def test_wrong_length():
    with pytest.raises(ValueError, match="wrong FFT length"):
        PC.fft_pallas(jnp.zeros((4, 96), jnp.complex64))


def test_fused_scale(rng):
    x = rand_c(rng, 64, 256)
    vr = jnp.array(np.ascontiguousarray(x.real))
    vi = jnp.array(np.ascontiguousarray(x.imag))
    o_r, o_i = PC.fft_planar(vr, vi, 256, scale=jnp.float32(0.5))
    o_r2, o_i2 = PC.fft_planar(vr * 0.5, vi * 0.5, 256)
    assert max_abs_err(np.asarray(o_r), np.asarray(o_r2)) < 1e-6


def test_multiple_iters_runs(rng):
    """The in-VMEM NREUSES loop runs and produces finite output (the
    reference likewise does not verify the multiple kernel's data,
    SURVEY.md §4)."""
    x = rand_c(rng, 64, 512)
    vr = jnp.array(np.ascontiguousarray(x.real))
    vi = jnp.array(np.ascontiguousarray(x.imag))
    o_r, o_i = PC.fft_planar(vr, vi, 512, multiple_iters=3)
    assert np.all(np.isfinite(np.asarray(o_r)))
    # 0 iters == plain transform
    p_r, _ = PC.fft_planar(vr, vi, 512)
    q_r, _ = PC.fft_planar(vr, vi, 512, multiple_iters=0)
    assert max_abs_err(np.asarray(p_r), np.asarray(q_r)) == 0.0


@pytest.mark.parametrize("n", [512])
def test_batch_shapes(rng, n):
    x = rand_c(rng, 64, n).reshape(4, 16, n)
    got = np.asarray(PC.fft_pallas(to_dev(x)))
    assert got.shape == (4, 16, n)
    assert max_abs_err(got, np.fft.fft(x.astype(np.complex128))) < tol(n)
