"""Distributed single-transform FFT over a TPU mesh (ICI collectives).

`sharding.py` scales the reference's one parallel axis — the batch
(one FFT per CUDA block, FFT-GPU-32bit.cu:586-595) — with zero
collectives.  This module goes beyond the reference: ONE transform whose
length exceeds a single chip's kernel (or memory) is computed across the
mesh with the four-step decomposition (ops/fourstep.py), where the
inter-stage transposes become `lax.all_to_all` collectives riding ICI:

    global A (N1, N2), columns sharded          local (N1, N2/d)
    stage 1: row FFT_N1 of A^T (local)          local (N2/d, N1)
    twiddle W_N^(n2*k1) (local, exact)          n2 offset = shard index
    ALL-TO-ALL: reshard rows->cols              local (N2, N1/d)
    stage 2: row FFT_N2 of C^T (local)          local (N1/d, N2)
    [natural order: ALL-TO-ALL + transpose]     local (N2/d, N1)

With ``transposed_output=True`` the final collective is skipped and the
result is the (N1, N2) matrix C with C[k1, k2] = X[k2*N1 + k1], k1
sharded — the FFTW MPI ``FFTW_MPI_TRANSPOSED_OUT`` contract.  The
inverse accepts that matrix directly (``transposed_input=True``): its
LOCAL transpose is exactly the column-sharded four-step input of the
inverse transform with swapped factors (X.reshape(N2, N1) = C^T), so the
same body runs with zero extra communication — a spectral round trip
(forward, pointwise multiply in C-layout, inverse) pays 3 collectives
instead of 4.

Every local stage is the fused single-HBM-pass row kernel on that chip's
shard; the only cross-chip traffic is the transpose collectives.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from smfft_tpu.ops import fourstep
from smfft_tpu.parallel.sharding import _shard_map


def _mesh_size(mesh: Mesh, axis_name: str) -> int:
    if axis_name not in mesh.shape:
        raise ValueError(f"mesh has no axis {axis_name!r}: {mesh.shape}")
    return mesh.shape[axis_name]


def plan_distributed(n: int, d: int) -> tuple[int, int]:
    """N = N1 * N2 with both factors supported row sizes divisible by the
    mesh size d (each shard must hold whole rows/columns)."""
    n1, n2 = fourstep.split_factors(n)
    if n1 % d or n2 % d:
        raise ValueError(
            f"Error wrong FFT length! N={n} = {n1}*{n2} is not divisible "
            f"by a {d}-device mesh (need d | {n2}); use a smaller mesh or "
            f"a larger N")
    return n1, n2


def _local_four_step(a_loc: jnp.ndarray, *, n: int, n1: int, n2: int,
                     d: int, inverse: bool, pre_transpose: bool,
                     transposed_out: bool, backend: str,
                     precision: str | None, axis_name: str) -> jnp.ndarray:
    """Per-device four-step body (runs under shard_map).

    ``a_loc`` is (n1, n2/d) — this chip's column block of the (n1, n2)
    input matrix — or, with ``pre_transpose``, the (n2/d, n1) local block
    of its distributed transpose (the transposed-output C-matrix of a
    prior forward, whose local transpose IS the column-sharded input of
    the inverse with swapped factors).
    """
    if pre_transpose:
        a_loc = jnp.swapaxes(a_loc, -1, -2)
    idx = jax.lax.axis_index(axis_name)
    # stage 1: FFT over n1 (length n1) at this chip's n2-column block
    b = fourstep._row_fft(jnp.swapaxes(a_loc, -1, -2), inverse, backend,
                          precision)                      # (n2/d, n1)
    off = idx * (n2 // d)
    n2_global = off + jnp.arange(n2 // d, dtype=jnp.uint32)
    b = fourstep.twiddle_rows(b, n2_global, n, inverse)
    # reshard rows->cols: (n2/d, n1) -> (n2, n1/d)
    c = jax.lax.all_to_all(b, axis_name, split_axis=1, concat_axis=0,
                           tiled=True)
    # stage 2: FFT over n2 (length n2) at this chip's k1-row block
    out = fourstep._row_fft(jnp.swapaxes(c, -1, -2), inverse, backend,
                            precision)                    # (n1/d, n2)
    if transposed_out:
        return out  # C[k1, k2] row block: X[k2*n1 + k1]
    # natural order: reshard back and transpose locally ->
    # X.reshape(n2, n1) row block
    e = jax.lax.all_to_all(out, axis_name, split_axis=1, concat_axis=0,
                           tiled=True)                    # (n1, n2/d)
    return jnp.swapaxes(e, -1, -2)                        # (n2/d, n1)


def _dist_c2c(x: jnp.ndarray, mesh: Mesh, *, inverse: bool,
              transposed_input: bool, transposed_output: bool,
              backend: str, precision: str | None, norm: str | None,
              axis_name: str) -> jnp.ndarray:
    d = _mesh_size(mesh, axis_name)
    if transposed_input:
        if transposed_output:
            raise ValueError("transposed_input with transposed_output "
                             "is not supported; the round-trip contract "
                             "is forward(transposed_output=True) -> "
                             "inverse(transposed_input=True) -> natural")
        if x.ndim != 2:
            raise ValueError("transposed_input expects the (N1, N2) "
                             "C-matrix a transposed-output forward "
                             "returned")
        fn1, fn2 = x.shape            # forward factors
        n = fn1 * fn2
        if (fn1, fn2) != plan_distributed(n, d):
            raise ValueError(f"unexpected transposed shape {x.shape}; "
                             f"expected {plan_distributed(n, d)}")
        # C^T = X.reshape(fn2, fn1): the inverse runs the standard body
        # with swapped factors; only a LOCAL transpose is needed, done
        # inside the shard_map body (pre_transpose).
        n1, n2 = fn2, fn1
        a = x
        in_spec = PSpec(axis_name, None)   # k1-rows sharded
    else:
        if x.ndim != 1:
            raise ValueError("distributed FFT takes one 1-D vector "
                             "(shard the batch with parallel.sharding "
                             "for many independent FFTs)")
        n = x.shape[0]
        n1, n2 = plan_distributed(n, d)
        a = x.reshape(n1, n2)
        in_spec = PSpec(None, axis_name)   # n2-columns sharded
    out_spec = PSpec(axis_name, None)
    body = partial(
        _local_four_step, n=n, n1=n1, n2=n2, d=d, inverse=inverse,
        pre_transpose=transposed_input, transposed_out=transposed_output,
        backend=backend, precision=precision, axis_name=axis_name)
    mapped = _shard_map(body, mesh, (in_spec,), out_spec)
    a = jax.device_put(a, NamedSharding(mesh, in_spec))
    out = jax.jit(mapped,
                  out_shardings=NamedSharding(mesh, out_spec))(a)
    if inverse and norm == "backward":
        out = out / n
    if transposed_output:
        return out                         # (n1, n2) C-matrix, k1 sharded
    return out.reshape(n)                  # natural order, sharded blocks


def distributed_fft(x: jnp.ndarray, mesh: Mesh, *,
                    transposed_output: bool = False,
                    backend: str = "auto", precision: str | None = None,
                    axis_name: str = "fft") -> jnp.ndarray:
    """ONE forward C2C FFT of a huge vector, sharded over the mesh.

    Args:
      x: complex64 (N,), N = N1*N2 a power of two with both balanced
        factors supported row sizes divisible by the mesh size (N in
        [1024, 2**28] for mesh sizes up to 32).
      transposed_output: skip the final all_to_all and return the
        (N1, N2) matrix C with C[k1, k2] = X[k2*N1 + k1], k1 sharded
        (FFTW_MPI_TRANSPOSED_OUT); feed it back via
        ``distributed_ifft(..., transposed_input=True)``.

    Returns the natural-order spectrum (N,) sharded in contiguous blocks
    unless ``transposed_output``.
    """
    return _dist_c2c(x, mesh, inverse=False, transposed_input=False,
                     transposed_output=transposed_output, backend=backend,
                     precision=precision, norm=None, axis_name=axis_name)


def distributed_ifft(x: jnp.ndarray, mesh: Mesh, *,
                     transposed_input: bool = False,
                     norm: str | None = "backward",
                     backend: str = "auto", precision: str | None = None,
                     axis_name: str = "fft") -> jnp.ndarray:
    """Inverse of :func:`distributed_fft`, returning natural-order time
    samples (N,).

    With ``transposed_input=True`` x is the (N1, N2) C-matrix a
    transposed-output forward returned (k1 sharded); the inverse consumes
    it with no extra communication (local transpose + swapped factors).
    ``norm="backward"`` divides by N; ``norm=None`` keeps the reference's
    raw unnormalized inverse (SURVEY.md quirk 3).
    """
    return _dist_c2c(x, mesh, inverse=True,
                     transposed_input=transposed_input,
                     transposed_output=False, backend=backend,
                     precision=precision, norm=norm, axis_name=axis_name)
