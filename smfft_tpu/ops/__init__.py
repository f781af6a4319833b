"""Optimized TPU compute paths.

* :mod:`smfft_tpu.ops.matmul_fft` — the mixed-radix MXU engine at the jnp
  level (XLA fuses twiddles into matmul epilogues; intermediates may round-
  trip HBM for large batches).
* :mod:`smfft_tpu.ops.pallas_c2c` — the fused single-HBM-pass Pallas kernel
  (the analogue of the reference's shared-memory-resident device core).
* :mod:`smfft_tpu.ops.pallas_real` — fused R2C/C2R Pallas kernels.
"""
