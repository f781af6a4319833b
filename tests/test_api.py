"""Public-API dispatch tests across backends (xla / spec / pallas-interp)."""

import numpy as np
import jax.numpy as jnp
import pytest

import smfft_tpu as S
import smfft_tpu.ops.pallas_c2c as PC

from conftest import max_abs_err


@pytest.fixture(params=["xla", "spec", "pallas"])
def backend(request):
    if request.param == "pallas":
        PC.set_interpret(True)
        yield "pallas"
        PC.set_interpret(False)
    else:
        yield request.param


def rand_c(rng, b, n):
    return (rng.random((b, n)) + 1j * rng.random((b, n))
            - 0.5 - 0.5j).astype(np.complex64)


def test_fft_all_backends(rng, backend):
    x = rand_c(rng, 64, 256)
    got = S.fft(jnp.array(x), backend=backend)
    assert max_abs_err(got, np.fft.fft(x.astype(np.complex128))) < 1e-4


def test_ifft_norm_backward(rng, backend):
    x = rand_c(rng, 64, 256)
    got = S.ifft(jnp.array(x), backend=backend)
    assert max_abs_err(got, np.fft.ifft(x.astype(np.complex128))) < 1e-6


def test_ifft_norm_none_matches_reference_contract(rng):
    """norm=None returns the raw unnormalized inverse (SURVEY.md quirk 3)."""
    x = rand_c(rng, 16, 512)
    got = S.ifft(jnp.array(x), backend="xla", norm=None)
    ref = np.fft.ifft(x.astype(np.complex128)) * 512
    assert max_abs_err(got, ref) < 1e-3


def test_rfft_irfft_all_backends(rng, backend):
    x = (rng.random((64, 512)) - 0.5).astype(np.float32)
    spec = S.rfft(jnp.array(x), backend=backend)
    assert max_abs_err(spec, np.fft.rfft(x.astype(np.float64))) < 1e-4
    back = S.irfft(spec, backend=backend)
    assert max_abs_err(back, x) < 1e-5


def test_fft_packed_real(rng, backend):
    x = (rng.random((64, 512)) - 0.5).astype(np.float32)
    got = np.asarray(S.fft_packed_real(jnp.array(x), backend=backend))
    ref = np.fft.rfft(x.astype(np.float64))
    assert got.shape == (64, 256)
    assert max_abs_err(got[:, 0].real, ref[:, 0].real) < 1e-4
    assert max_abs_err(got[:, 0].imag, ref[:, 256].real) < 1e-4
    assert max_abs_err(got[:, 1:], ref[:, 1:256]) < 1e-4


def test_unordered_fft_xla(rng):
    from smfft_tpu.ops.matmul_fft import digit_reverse_indices
    import smfft_tpu.params as P
    x = rand_c(rng, 16, 1024)
    u = np.asarray(S.fft(jnp.array(x), ordered=False, backend="xla"))
    perm = digit_reverse_indices(1024, P.get_factorization(1024))
    assert max_abs_err(u[:, perm], np.fft.fft(x.astype(np.complex128))) < 1e-4


def test_plan_system():
    from smfft_tpu import plan_for, FFTParams
    p = plan_for(1024)
    assert p.exp == 10 and p.core_n == 1024 and p.sign == -1.0
    q = plan_for(1024, "inverse", "r2c")
    assert q.core_n == 512 and q.sign == +1.0
    assert plan_for(1024) is plan_for(1024)  # cached
    with pytest.raises(ValueError, match="wrong FFT length"):
        FFTParams(n=100)


def test_packing_requirement_message():
    with pytest.raises(ValueError, match="multiple of 4"):
        PC.fft_pallas(jnp.zeros((6, 32), jnp.complex64))


def test_ifft_unordered_roundtrip(rng, backend):
    """fft(ordered=False) |> ifft_unordered == x (relayout-free pair)."""
    x = rand_c(rng, 64, 1024)
    u = S.fft(jnp.array(x), ordered=False, backend=backend)
    from smfft_tpu import api
    back = api.ifft_unordered(u, backend=backend)
    assert max_abs_err(back, x) < 1e-5
