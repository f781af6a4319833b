#!/usr/bin/env python
"""Device probe: does the SMEM-scalar split pass compile + verify on TPU?"""
import sys

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from smfft_tpu import planar as PLA
    print("device:", jax.devices()[0].device_kind, jax.default_backend(),
          flush=True)
    rng = np.random.default_rng(0)
    for e in [int(a) for a in (sys.argv[1:] or ["16"])]:
        n = 1 << e
        x = (rng.random((2, n)) * 2 - 1).astype(np.float32)
        try:
            hr, hi = PLA.rfft_large(jnp.asarray(x))
            got = np.asarray(hr) + 1j * np.asarray(hi)
            ref = np.fft.rfft(x.astype(np.float64))
            full = np.concatenate([got[:, :1].real, got[:, 1:],
                                   1j * got[:, :1].imag], axis=-1)
            full[:, 0] = got[:, 0].real
            full[:, -1] = got[:, 0].imag
            err = np.max(np.abs(full - ref)) / np.max(np.abs(ref))
            print(f"rfft_large 2^{e}: rel err {err:.3e}", flush=True)
            # round trip
            back = np.asarray(PLA.irfft_large(hr, hi, n))
            rerr = np.max(np.abs(back - x))
            print(f"irfft_large 2^{e}: rt err {rerr:.3e}", flush=True)
        except Exception as ex:  # noqa: BLE001
            print(f"2^{e} FAILED: {str(ex)[:300]}", flush=True)
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
