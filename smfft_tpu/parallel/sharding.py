"""Batch sharding of FFT workloads over a TPU device mesh.

The reference's only parallelism is one FFT per CUDA block over a grid
(FFT-GPU-32bit.cu:586-595) in a single GPU.  The TPU-native scale-out of
the same design is data parallelism over the batch axis: each chip runs
the identical fused kernel on its shard; there is no cross-FFT data flow,
so no collectives are inserted (SURVEY.md §2.4 — "do not invent" axes the
reference doesn't have).

Usage:
    mesh = batch_mesh()                       # all devices on axis "batch"
    y = sharded_fft(x, mesh)                  # x: (B, N) complex, B % ndev == 0
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec


def batch_mesh(devices=None, axis_name: str = "batch") -> Mesh:
    """1-D mesh over all (or given) devices, batch axis only."""
    devices = np.array(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (axis_name,))


def shard_batch(x: jnp.ndarray, mesh: Mesh, axis_name: str = "batch"):
    """Place x with its leading axis sharded over the mesh."""
    spec = PSpec(axis_name, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def _shard_map(fn, mesh: Mesh, in_specs, out_specs):
    """jax.shard_map across jax versions (experimental path fallback).

    check_vma=False: pallas_call outputs carry no varying-mesh-axes
    metadata, and the batch-parallel mapping needs no collective-safety
    analysis (every row is device-local by construction)."""
    try:
        return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=False)
    except (AttributeError, TypeError):
        from jax.experimental.shard_map import shard_map
        return shard_map(fn, mesh=mesh, in_specs=in_specs,
                         out_specs=out_specs, check_rep=False)


def sharded_fft(x: jnp.ndarray, mesh: Mesh, *, inverse: bool = False,
                ordered: bool = True, backend: str = "auto",
                precision: str = "highest", axis_name: str = "batch"):
    """Batched C2C FFT with the batch axis sharded across the mesh.

    XLA backends go through jax.jit + sharding annotations: XLA
    SPMD-partitions the program; since every FFT is row-local, the
    partitioned program has zero collectives and each chip runs the same
    program on B/ndev rows.  The Pallas backend — the product kernel —
    instead rides shard_map (manual SPMD): a pallas_call is an opaque
    custom call the XLA partitioner cannot split, so shard_map runs the
    fused kernel per device on its local (B/ndev, N) shard, which is
    exactly the batch-parallel contract (SURVEY.md §2.4: one FFT per
    block, grid = batch; here one shard per chip, grid = local batch).
    """
    from smfft_tpu import api

    spec = PSpec(axis_name, *([None] * (x.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    x = jax.lax.with_sharding_constraint(
        jax.device_put(x, sharding), sharding)

    fn = partial(api.ifft if inverse else api.fft, ordered=ordered,
                 backend=backend, precision=precision)
    resolved = backend
    if resolved == "auto":
        resolved = "pallas" if jax.default_backend() == "tpu" else "xla"
    if resolved == "pallas":
        mapped = _shard_map(fn, mesh, (spec,), spec)
        return jax.jit(mapped, out_shardings=sharding)(x)
    return jax.jit(fn, out_shardings=sharding)(x)


def sharded_rfft(x: jnp.ndarray, mesh: Mesh, *, backend: str = "auto",
                 precision: str = "highest", axis_name: str = "batch"):
    """Batched R2C with the batch axis sharded across the mesh."""
    from smfft_tpu import api

    spec = PSpec(axis_name, *([None] * (x.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    x = jax.device_put(x, sharding)
    out_spec = PSpec(axis_name, *([None] * (x.ndim - 1)))
    fn = partial(api.rfft, backend=backend, precision=precision)
    return jax.jit(fn, out_shardings=NamedSharding(mesh, out_spec))(x)


def sharded_convolve(x: jnp.ndarray, h: jnp.ndarray, mesh: Mesh, *,
                     backend: str = "auto", precision: str = "highest",
                     axis_name: str = "batch"):
    """Fused circular convolution with the batch axis sharded across the
    mesh and the filter (or (M, N) bank) replicated to every chip — the
    batch-parallel matched-filter shape: zero collectives, each chip
    convolves its local rows against the full template bank."""
    from smfft_tpu import api

    spec = PSpec(axis_name, *([None] * (x.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    x = jax.device_put(x, sharding)
    h_spec = PSpec(*([None] * h.ndim))  # replicated
    h = jax.device_put(h, NamedSharding(mesh, h_spec))
    bank_dims = 1 if h.ndim == 2 else 0
    out_spec = PSpec(*([None] * bank_dims), axis_name,
                     *([None] * (x.ndim - 1)))
    out_sharding = NamedSharding(mesh, out_spec)
    fn = partial(api.convolve, backend=backend, precision=precision)
    resolved = backend
    if resolved == "auto":
        resolved = "pallas" if jax.default_backend() == "tpu" else "xla"
    if resolved == "pallas":
        mapped = _shard_map(fn, mesh, (spec, h_spec), out_spec)
        return jax.jit(mapped, out_shardings=out_sharding)(x, h)
    return jax.jit(fn, out_shardings=out_sharding)(x, h)


def sharded_irfft(spec_arr: jnp.ndarray, mesh: Mesh, n: int, *,
                  backend: str = "auto", precision: str = "highest",
                  norm: str | None = "backward",
                  axis_name: str = "batch"):
    """Batched C2R inverse with the batch axis sharded across the mesh."""
    from smfft_tpu import api

    pspec = PSpec(axis_name, *([None] * (spec_arr.ndim - 1)))
    sharding = NamedSharding(mesh, pspec)
    spec_arr = jax.device_put(spec_arr, sharding)
    fn = partial(api.irfft, n=n, backend=backend, precision=precision,
                 norm=norm)
    return jax.jit(fn, out_shardings=sharding)(spec_arr)
