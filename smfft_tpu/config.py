"""Feature-flag configuration — the analogue of the reference's debug.h.

The reference gates its paths with compile-time flags
(``DEBUG/CUFFT/EXTERNAL/MULTIPLE/TESTING``, SMFFT_CooleyTukey_C2C/debug.h:1-5,
SMFFT_Stockham_C2C/debug.h:1-7).  Here the same knobs are process-level
settings read from the environment once at import (so behavior is
deterministic per run) with programmatic overrides for tests.

Flags:
  SMFFT_DEBUG      — verbose prints from harness paths          (debug.h DEBUG)
  SMFFT_TESTING    — run golden verification inside benchmarks  (debug.h TESTING)
  SMFFT_EXTERNAL   — include the external path in sweeps        (debug.h EXTERNAL)
  SMFFT_MULTIPLE   — include the multiple path in sweeps        (debug.h MULTIPLE)
  SMFFT_PRECISION  — default MXU precision ("highest"/"default")
  SMFFT_INTERPRET  — run Pallas kernels through the interpreter
"""

from __future__ import annotations

import dataclasses
import os


def _env_bool(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v.strip().lower() not in ("0", "false", "no", "off", "")


@dataclasses.dataclass
class Flags:
    debug: bool = _env_bool("SMFFT_DEBUG", False)
    testing: bool = _env_bool("SMFFT_TESTING", True)
    external: bool = _env_bool("SMFFT_EXTERNAL", True)
    multiple: bool = _env_bool("SMFFT_MULTIPLE", True)
    precision: str = os.environ.get("SMFFT_PRECISION", "highest")
    interpret: bool = _env_bool("SMFFT_INTERPRET", False)


flags = Flags()

if flags.interpret:  # pragma: no cover - env-driven
    from smfft_tpu.ops import pallas_c2c

    pallas_c2c.set_interpret(True)


def debug_print(*args) -> None:
    """printf gated on the DEBUG flag (reference debug.h:1 usage)."""
    if flags.debug:
        print("[smfft]", *args)
