"""Multi-chip batch parallelism (see :mod:`smfft_tpu.parallel.sharding`).

The reference is strictly single-GPU (int device=0, FFT-GPU-32bit.cu:15;
no MPI/NCCL/streams — SURVEY.md §2.4).  Its one parallelism axis is the
batch (grid of independent FFT blocks), which on TPU maps to sharding the
leading batch axis of the input across a jax.sharding.Mesh: embarrassingly
parallel, zero collectives, scaling over ICI/DCN for free.
"""

from smfft_tpu.parallel.sharding import (  # noqa: F401
    batch_mesh,
    shard_batch,
    sharded_convolve,
    sharded_fft,
)
