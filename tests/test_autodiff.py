"""Differentiability of the public transforms: custom VJPs through the
fused Pallas kernels, verified against jax.numpy.fft's gradients on the
Pallas interpreter (CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smfft_tpu import api
import smfft_tpu.ops.pallas_c2c as PC

from conftest import max_abs_err


@pytest.fixture(autouse=True, scope="module")
def interpret_mode():
    PC.set_interpret(True)
    yield
    PC.set_interpret(False)


N = 256
B = 4


def _cdata(rng, shape):
    return jnp.array((rng.random(shape) + 1j * rng.random(shape)
                      - 0.5 - 0.5j).astype(np.complex64))


def _rdata(rng, shape):
    return jnp.array((rng.random(shape) - 0.5).astype(np.float32))


@pytest.mark.parametrize("backend", ["pallas", "xla"])
def test_fft_vjp_matches_jnp(rng, backend):
    x = _cdata(rng, (B, N))
    g = _cdata(rng, (B, N))
    _, vjp = jax.vjp(lambda v: api.fft(v, backend=backend), x)
    _, vjp_ref = jax.vjp(jnp.fft.fft, x)
    assert max_abs_err(np.asarray(vjp(g)[0]),
                       np.asarray(vjp_ref(g)[0])) < 1e-3


@pytest.mark.parametrize("norm", ["backward", None])
def test_ifft_vjp_matches_jnp(rng, norm):
    x = _cdata(rng, (B, N))
    g = _cdata(rng, (B, N))
    _, vjp = jax.vjp(lambda v: api.ifft(v, backend="pallas", norm=norm), x)
    scale = 1.0 if norm == "backward" else N
    _, vjp_ref = jax.vjp(lambda v: jnp.fft.ifft(v) * scale, x)
    assert max_abs_err(np.asarray(vjp(g)[0]),
                       np.asarray(vjp_ref(g)[0])) < 1e-3


def test_rfft_vjp_matches_jnp(rng):
    x = _rdata(rng, (B, N))
    g = _cdata(rng, (B, N // 2 + 1))
    _, vjp = jax.vjp(lambda v: api.rfft(v, backend="pallas"), x)
    _, vjp_ref = jax.vjp(jnp.fft.rfft, x)
    got, ref = np.asarray(vjp(g)[0]), np.asarray(vjp_ref(g)[0])
    assert got.dtype == np.float32
    assert max_abs_err(got, ref) < 1e-3


@pytest.mark.parametrize("norm", ["backward", None])
def test_irfft_vjp_matches_jnp(rng, norm):
    spec = _cdata(rng, (B, N // 2 + 1))
    g = _rdata(rng, (B, N))
    _, vjp = jax.vjp(lambda v: api.irfft(v, n=N, backend="pallas",
                                         norm=norm), spec)
    scale = 1.0 if norm == "backward" else N // 2
    _, vjp_ref = jax.vjp(lambda v: jnp.fft.irfft(v, N) * scale, spec)
    assert max_abs_err(np.asarray(vjp(g)[0]),
                       np.asarray(vjp_ref(g)[0])) < 1e-3


def test_grad_through_fft_loss(rng):
    """grad of a real scalar loss through the fused kernel equals the
    same grad through jnp.fft, and jit composes."""
    x = _cdata(rng, (B, N))

    def loss(fn):
        return lambda v: jnp.sum(jnp.abs(fn(v)) ** 2)

    # (no jax.jit here: jitting the interpreter-mode kernel inlines the
    # whole interpret loop into one giant XLA program — minutes to
    # compile on CPU; the real-TPU smoke covers grad-under-jit instead)
    g1 = jax.grad(loss(lambda v: api.fft(v, backend="pallas")),
                  holomorphic=False)(x)
    g2 = jax.grad(loss(jnp.fft.fft))(x)
    assert max_abs_err(np.asarray(g1), np.asarray(g2)) < 2e-2


def test_convolve_vjp_both_args(rng):
    x = _cdata(rng, (B, N))
    h = _cdata(rng, (N,))

    def ref_conv(x_, h_):
        return jnp.fft.ifft(jnp.fft.fft(x_) * h_)

    g = _cdata(rng, (B, N))
    _, vjp = jax.vjp(lambda a, b: api.convolve(a, b, backend="pallas"),
                     x, h)
    _, vjp_ref = jax.vjp(ref_conv, x, h)
    gx, gh = vjp(g)
    rx, rh = vjp_ref(g)
    assert max_abs_err(np.asarray(gx), np.asarray(rx)) < 1e-3
    assert max_abs_err(np.asarray(gh), np.asarray(rh)) < 1e-2


def test_convolve_real_vjp_learned_filter(rng):
    """The matched-filter training shape: gradient w.r.t. a real-signal
    bank's filter response."""
    x = _rdata(rng, (B, N))
    h = _cdata(rng, (N // 2 + 1,))

    def loss(h_):
        y = api.convolve_real(x, h_, backend="pallas")
        return jnp.sum(y ** 2)

    def loss_ref(h_):
        y = jnp.fft.irfft(jnp.fft.rfft(x) * h_, N)
        return jnp.sum(y ** 2)

    gh = jax.grad(loss)(h)
    rh = jax.grad(loss_ref)(h)
    assert max_abs_err(np.asarray(gh), np.asarray(rh)) < 1e-2


def test_grad_through_dct_and_hilbert(rng):
    """Composition: modules built on the api primitives differentiate
    end-to-end with no extra rules."""
    import sys
    import smfft_tpu.dct  # noqa: F401
    D = sys.modules["smfft_tpu.dct"]
    from smfft_tpu import signal as sig

    x = _rdata(rng, (2, N))
    g1 = jax.grad(lambda v: jnp.sum(D.dct(v, type=2) ** 2))(x)
    assert np.all(np.isfinite(np.asarray(g1)))
    g2 = jax.grad(lambda v: jnp.sum(jnp.abs(sig.hilbert(v)) ** 2))(x)
    # d/dx sum |analytic|^2: check against finite jnp composition
    def ref(v):
        n = v.shape[-1]
        m = np.zeros(n, np.float32)
        m[0] = 1.0
        m[1:n // 2] = 2.0
        m[n // 2] = 1.0
        return jnp.sum(jnp.abs(jnp.fft.ifft(jnp.fft.fft(v) * m)) ** 2)
    g2_ref = jax.grad(lambda v: ref(v))(x)
    assert max_abs_err(np.asarray(g2), np.asarray(g2_ref)) < 2e-2


def test_fft_unordered_not_differentiable(rng):
    x = _cdata(rng, (B, N))
    with pytest.raises(Exception):
        jax.vjp(lambda v: api.fft(v, ordered=False, backend="pallas"), x)
