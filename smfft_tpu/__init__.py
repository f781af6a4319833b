"""smfft_tpu — a TPU-native batched small/medium FFT framework.

Built from scratch in JAX/XLA/Pallas with the capabilities of KAdamek/SMFFT
(reference at /root/reference): statically-specialized batched power-of-two
fp32 FFTs (N = 32..8192 complex, up to 16384 real; the reference covers
32..4096) that execute entirely in on-chip VMEM — the TPU analogue of the
reference's shared-memory-resident GPU FFTs (reference README.md:10-14).

Design (TPU-first, not a CUDA port):
  * Butterfly stages are expressed as dense DFT-matrix contractions that run
    on the MXU (systolic array), with twiddle factors applied as fused
    element-wise VPU ops — replacing the reference's warp-shuffle /
    padded-shared-memory exchange networks
    (reference SMFFT_CooleyTukey_C2C/FFT-GPU-32bit.cu:334-532).
  * Compile-time specialization happens through Python closures + jax.jit
    static arguments keyed on a frozen ``FFTParams`` plan — replacing the
    reference's FFT_Params template-class hierarchy
    (reference SMFFT_CooleyTukey_C2C/SM_FFT_parameters.cuh:1-390).
  * The hot path is a Pallas kernel whose FFT core is an *emitter function*
    composable inside other Pallas kernels, mirroring the reference's
    ``__device__``-function composability (reference README.md:10).
  * Batch parallelism across chips is plain sharding of the leading batch
    axis over a jax.sharding.Mesh; the reference has no distributed
    machinery (SURVEY.md §2.4) so no collectives are needed.

Public API: :func:`fft`, :func:`ifft`, :func:`rfft`, :func:`irfft`, and
the one-fused-kernel :func:`convolve` in :mod:`smfft_tpu.api`.
"""

import smfft_tpu.config  # noqa: F401  (applies SMFFT_* env flags eagerly:
# config.set_interpret must run before any kernel builder caches on the
# interpret flag — lazy import left SMFFT_INTERPRET=1 unapplied for entry
# points that never touched pallas_c2c._build, e.g. the pencil real path)
from smfft_tpu.params import (
    FFTParams,
    SUPPORTED_C2C_SIZES,
    SUPPORTED_REAL_SIZES,
    plan_for,
)
from smfft_tpu.api import (fft, ifft, ifft_unordered, rfft, irfft,
                           fft_packed_real, convolve, convolve_real,
                           fft_large, ifft_large, rfft_large, irfft_large)
from smfft_tpu.signal import (fftconvolve, get_window, power_spectrum,
                              periodogram, welch, spectrogram, stft,
                              istft)
from smfft_tpu.ndim import (fft2, ifft2, fftn, ifftn, rfft2, irfft2,
                            rfftn, irfftn, hfft, ihfft,
                            fftshift, ifftshift, fftfreq, rfftfreq)
from smfft_tpu.bluestein import (fft_any, ifft_any, rfft_any, irfft_any,
                                 czt, zoom_fft)
from smfft_tpu.dct import (dct, idct, dst, idst, dctn, idctn, dstn,
                           idstn)
from smfft_tpu.signal import (oaconvolve, fftcorrelate, hilbert, envelope,
                              resample)

__version__ = "0.2.0"

__all__ = [
    "FFTParams",
    "SUPPORTED_C2C_SIZES",
    "SUPPORTED_REAL_SIZES",
    "plan_for",
    "fft",
    "ifft",
    "ifft_unordered",
    "rfft",
    "irfft",
    "fft_packed_real",
    "convolve",
    "convolve_real",
    "fft_large",
    "ifft_large",
    "rfft_large",
    "irfft_large",
    "fftconvolve",
    "get_window",
    "power_spectrum",
    "periodogram",
    "welch",
    "spectrogram",
    "stft",
    "istft",
    "fft2",
    "ifft2",
    "fftn",
    "ifftn",
    "rfft2",
    "irfft2",
    "fftshift",
    "ifftshift",
    "fftfreq",
    "rfftfreq",
    "fft_any",
    "ifft_any",
    "czt",
    "zoom_fft",
    "rfft_any",
    "irfft_any",
    "oaconvolve",
    "fftcorrelate",
    "hilbert",
    "envelope",
    "resample",
    "dct",
    "idct",
    "dst",
    "idst",
    "dctn",
    "idctn",
    "dstn",
    "idstn",
    "rfftn",
    "irfftn",
    "hfft",
    "ihfft",
]
