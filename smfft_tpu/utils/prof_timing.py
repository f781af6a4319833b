"""Device-side kernel timing via the JAX profiler.

The axon TPU tunnel's host-side wall clocks carry a large, phase-varying
dispatch overhead (~25 ms RTT, slow phases), which made host differencing
methods (single-dispatch small/big, chained fori_loop) disagree by 2-3x
on identical kernels.  The TPU's own trace counters do not lie:
``device_time_ms`` runs a callable under ``jax.profiler.trace`` and
returns the median per-invocation device execution time of the XLA
programs it launched.

This is the TPU-native analogue of the reference's GpuTimer (cudaEvent
elapsed time around the kernel, timer.h:6-40): on-device duration,
host-side overhead excluded.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import tempfile


def _parse_device_events(trace_dir: str):
    """Device-track events {name: [dur_us, ...]} from the newest trace."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        raise RuntimeError(f"no trace produced under {trace_dir}")
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    durs = collections.defaultdict(list)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        track = str(pid_names.get(e["pid"], ""))
        if "TPU" in track or "device" in track.lower():
            durs[e["name"]].append(e["dur"])
    return durs


def device_time_ms(f, reps: int = 5, match: str = r"^jit_",
                   warmup: int = 1) -> float:
    """Median device time (ms) per invocation of ``f``.

    ``f`` must be synchronous: it returns only after its device work is
    complete (e.g. it ends with a small scalar readback — over the axon
    tunnel ``block_until_ready`` alone is not reliable).  Runs ``f``
    ``reps`` times under one profiler trace and, for each device-track
    XLA program whose name matches ``match`` (programs are named
    ``jit_<fn>``), takes the median duration across invocations times
    the invocations-per-rep count; programs are summed.  Nested
    sub-events have distinct names and are not double-counted.
    """
    for _ in range(warmup):
        f()

    import jax

    pat = re.compile(match)
    with tempfile.TemporaryDirectory(prefix="smfft_prof_") as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                f()
        durs = _parse_device_events(td)
        matched = {k: v for k, v in durs.items() if pat.search(k)}
        if not matched:
            raise RuntimeError(
                f"no device events matched {match!r}; saw "
                f"{sorted(durs)[:8]}")
        total = 0.0
        for _name, ds in matched.items():
            ds = sorted(ds)
            k = max(1, round(len(ds) / reps))  # invocations per rep
            total += k * ds[len(ds) // 2]
    return total / 1e3


def device_gbs(f, nbytes: int, reps: int = 5,
               match: str = r"^jit_") -> float:
    """Device-side throughput of ``f`` in GB/s given its HBM traffic."""
    ms = device_time_ms(f, reps=reps, match=match)
    return nbytes / (ms * 1e-3) / 1e9
