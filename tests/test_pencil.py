"""Pencil-layout in-VMEM multiple path (ops/pencil.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from smfft_tpu.ops import pallas_c2c as PC
from smfft_tpu.ops import pencil


@pytest.fixture(autouse=True)
def _interp():
    PC.set_interpret(True)
    yield


@pytest.mark.parametrize("n", [32, 128, 256])
def test_single_application_matches_numpy(n):
    rng = np.random.default_rng(3)
    x = (rng.random((1024, n)) + 1j * rng.random((1024, n))
         - 0.5 - 0.5j).astype(np.complex64)
    o_r, o_i = pencil.multiple_pencil_planar(
        jnp.array(x.real.copy()), jnp.array(x.imag.copy()), n, iters=1)
    got = (np.asarray(o_r) + 1j * np.asarray(o_i)) * np.sqrt(n)
    ref = np.fft.fft(x.astype(np.complex128))
    assert np.max(np.abs(got - ref)) < 1e-4


def test_inverse_direction_roundtrip():
    n = 256
    rng = np.random.default_rng(4)
    x = (rng.random((1024, n)) + 1j * rng.random((1024, n))
         - 0.5 - 0.5j).astype(np.complex64)
    f_r, f_i = pencil.multiple_pencil_planar(
        jnp.array(x.real.copy()), jnp.array(x.imag.copy()), n, iters=1)
    b_r, b_i = pencil.multiple_pencil_planar(f_r, f_i, n, iters=1,
                                             inverse=True)
    back = np.asarray(b_r) + 1j * np.asarray(b_i)  # 1/sqrt(n)^2 * n = 1
    assert np.max(np.abs(back - x)) < 1e-4


def test_composed_convolution_emitters():
    """The reference's __device__ composability story in pencil form:
    FFT -> per-frequency filter -> IFFT with the public emitters, all
    plane-list operations (README.md:10, the in-kernel conv use case)."""
    import jax
    import numpy as np

    n = 256
    rng = np.random.default_rng(6)
    x = (rng.random((1024, n)) - 0.5).astype(np.float32)
    h = (rng.random(n) - 0.5).astype(np.float32)   # shared filter taps
    hf = np.fft.fft(h.astype(np.complex128))
    with jax.disable_jit():
        br = pencil.to_pencil(jnp.array(x), n)
        bi = pencil.to_pencil(jnp.zeros_like(jnp.array(x)), n)
        fr, fi = pencil.plane_fft(pencil.planes(br, n),
                                  pencil.planes(bi, n))
        # frequency-domain multiply: plane k is frequency k, so the
        # filter is a python-scalar complex multiply per plane
        gr = [fr[k] * float(hf[k].real) - fi[k] * float(hf[k].imag)
              for k in range(n)]
        gi = [fr[k] * float(hf[k].imag) + fi[k] * float(hf[k].real)
              for k in range(n)]
        brr, bii = pencil.plane_fft(gr, gi, inverse=True)
        out = pencil.from_pencil(jnp.concatenate(brr, axis=0), n) / n
    ref = np.real(np.fft.ifft(np.fft.fft(x.astype(np.complex128)) * hf))
    assert np.max(np.abs(np.asarray(out) - ref)) < 1e-3


def test_rfft_ordered_dispatch_natural_layout():
    """rfft_fused_planar(ordered=True) routes to the pencil kernel and
    returns the NATURAL-order packed spectrum (slot 0 = (DC, Nyquist));
    irfft_fused_planar(in_natural=True) inverts it (reference packed
    contract, FFT-GPU-32bit-Stockham.cu:332-340)."""
    import numpy as np
    from smfft_tpu.ops import pallas_real as PR

    n = 256
    rng = np.random.default_rng(9)
    x = (rng.random((64, n)) - 0.5).astype(np.float32)
    o_r, o_i = PR.rfft_fused_planar(jnp.array(x), ordered=True)
    got = np.asarray(o_r) + 1j * np.asarray(o_i)
    ref = np.fft.rfft(x.astype(np.float64))
    assert np.max(np.abs(got[:, 0].real - ref[:, 0].real)) < 1e-4
    assert np.max(np.abs(got[:, 0].imag - ref[:, n // 2].real)) < 1e-4
    assert np.max(np.abs(got[:, 1:] - ref[:, 1:n // 2])) < 1e-4
    back = np.asarray(PR.irfft_fused_planar(o_r, o_i, n,
                                            in_natural=True)) / (n // 2)
    assert np.max(np.abs(back - x)) < 1e-4


def test_pad_and_bounds():
    n = 256
    rng = np.random.default_rng(5)
    vr = jnp.array(rng.random((100, n), dtype=np.float32))
    vi = jnp.array(rng.random((100, n), dtype=np.float32))
    o_r, o_i = pencil.multiple_pencil_planar(vr, vi, n, iters=1)
    assert o_r.shape == (100, n)
    # out-of-range size (bounds check fires before the width check)
    with pytest.raises(ValueError, match="wrong FFT length"):
        pencil.multiple_pencil_planar(vr, vi, 8192, iters=1)
    # non-power-of-two inside the range (ADVICE r2: used to die deep in
    # the plane ladder with an opaque TypeError)
    vr96 = jnp.array(rng.random((8, 96), dtype=np.float32))
    with pytest.raises(ValueError, match="wrong FFT length"):
        pencil.multiple_pencil_planar(vr96, vr96, 96, iters=1)
    # width mismatch for a supported size
    with pytest.raises(ValueError, match="row width"):
        pencil.multiple_pencil_planar(vr, vi, 1024, iters=1)


def test_small_batch_uses_few_slabs():
    """An 8-row batch must not pay the full 1024-row block padding
    (ADVICE r2): the slab picker builds a 1-slab kernel and the result
    still matches numpy."""
    n = 256
    assert pencil._pick_slabs(n, 8) == 1
    assert pencil._pick_slabs(n, 300) == 3
    assert pencil._pick_slabs(n, 5000) == 8
    assert pencil._pick_slabs(4096, 5000) == 4  # VMEM-capped block
    rng = np.random.default_rng(11)
    x = (rng.random((8, n)) + 1j * rng.random((8, n))
         - 0.5 - 0.5j).astype(np.complex64)
    o_r, o_i = pencil.multiple_pencil_planar(
        jnp.array(x.real.copy()), jnp.array(x.imag.copy()), n, iters=1)
    got = (np.asarray(o_r) + 1j * np.asarray(o_i)) * np.sqrt(n)
    assert np.max(np.abs(got - np.fft.fft(x.astype(np.complex128)))) < 1e-4
    # fused real path, small batch: 1-slab kernels
    from smfft_tpu.ops import pallas_real as PR
    xr = (rng.random((8, n)) - 0.5).astype(np.float32)
    s_r, s_i = PR.rfft_fused_planar(jnp.array(xr), ordered=True)
    ref = np.fft.rfft(xr.astype(np.float64))
    assert np.max(np.abs(np.asarray(s_r)[:, 1:] + 1j * np.asarray(s_i)[:, 1:]
                         - ref[:, 1:n // 2])) < 1e-4
