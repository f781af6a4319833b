"""Host <-> device transfer of complex data without complex dtype crossings.

The axon TPU runtime (and some other PJRT backends) cannot transfer
complex64 buffers across the host/device boundary, although on-device
complex arithmetic inside jit works.  These helpers move complex data as
zero-copy float32 ``(..., N, 2)`` views — numpy's complex64 memory layout
is exactly interleaved (re, im) fp32 pairs, so the host-side view is free —
and convert to/from on-device complex with a tiny jitted kernel.

This mirrors the reference's H2D/D2H staging role
(SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:852-868) where float2 buffers cross
the PCIe boundary; float2-as-two-floats is the same trick.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _pairs_to_complex(v: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.complex(v[..., 0], v[..., 1])


@jax.jit
def _complex_to_pairs(z: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)


def host_view_pairs(x: np.ndarray) -> np.ndarray:
    """Zero-copy view of host complex64 (..., N) as float32 (..., N, 2)."""
    if x.dtype != np.complex64:
        x = np.ascontiguousarray(x, dtype=np.complex64)
    return np.ascontiguousarray(x).view(np.float32).reshape(x.shape + (2,))


def to_device_complex(x: np.ndarray, device=None) -> jax.Array:
    """Host complex64 -> on-device complex64 array (usable inside jit)."""
    v = jnp.array(host_view_pairs(x))
    if device is not None:
        v = jax.device_put(v, device)
    return _pairs_to_complex(v)


def from_device_complex(z: jax.Array) -> np.ndarray:
    """On-device complex array -> host complex64 ndarray."""
    pairs = np.asarray(_complex_to_pairs(z))
    return np.ascontiguousarray(pairs).view(np.complex64)[..., 0]


def to_device_real(x: np.ndarray, device=None) -> jax.Array:
    arr = jnp.array(np.ascontiguousarray(x, dtype=np.float32))
    if device is not None:
        arr = jax.device_put(arr, device)
    return arr


def as_complex64(x: jnp.ndarray) -> jnp.ndarray:
    """Promote to complex64 without an eager real->complex
    convert_element_type, which the axon TPU backend rejects
    (UNIMPLEMENTED at readback).  ``lax.complex`` of (x, 0) is the one
    promotion path proven to work on that backend; complex input passes
    through (with a c64 cast only when already complex128)."""
    if jnp.iscomplexobj(x):
        return x if x.dtype == jnp.complex64 else x.astype(jnp.complex64)
    xr = x.astype(jnp.float32) if x.dtype != jnp.float32 else x
    return jax.lax.complex(xr, jnp.zeros_like(xr))
