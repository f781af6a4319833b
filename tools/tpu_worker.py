#!/usr/bin/env python
"""Persistent TPU job worker for the axon tunnel.

The tunnel admits ONE client process at a time and wedges for several
minutes after a client exits before the next can attach (verify skill
gotcha 7, observed round 5).  Iterative device work — smoke, bench,
probes — therefore runs inside a single long-lived process: this worker
acquires the device once, then executes python job files dropped into
the spool directory sequentially, in-process.  Build caches
(functools.lru_cache kernel builders) and the persistent compile cache
stay warm across jobs.

Usage:
    python tools/tpu_worker.py [spool_dir]     # default /tmp/tpu_jobs

Drop `NN_name.py` files into the spool; they run in filename order with
`__name__ == "__main__"`.  Output streams to `<spool>/done/NN_name.py.log`
with a trailing JOB_OK / JOB_EXIT <code> / JOB_FAIL marker; the job file
moves to `<spool>/done/` when finished.  Drop a file named `STOP` to shut
the worker down cleanly (letting the tunnel release the device).
"""

from __future__ import annotations

import os
import sys
import time
import traceback


def main() -> None:
    spool = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_jobs"
    done = os.path.join(spool, "done")
    os.makedirs(spool, exist_ok=True)
    os.makedirs(done, exist_ok=True)

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from smfft_tpu.utils.compile_cache import enable
    cache = enable()
    import jax
    print(f"worker up: {jax.devices()} cache={cache}", flush=True)

    while True:
        if os.path.exists(os.path.join(spool, "STOP")):
            os.remove(os.path.join(spool, "STOP"))
            print("worker: STOP — exiting", flush=True)
            return
        jobs = sorted(f for f in os.listdir(spool) if f.endswith(".py"))
        if not jobs:
            time.sleep(2)
            continue
        name = jobs[0]
        path = os.path.join(spool, name)
        print(f"worker: running {name}", flush=True)
        log = open(os.path.join(done, name + ".log"), "w", buffering=1)
        old_out, old_err = sys.stdout, sys.stderr
        sys.stdout = sys.stderr = log
        t0 = time.time()
        try:
            src = open(path).read()
            exec(compile(src, path, "exec"), {"__name__": "__main__"})
            print(f"JOB_OK {time.time() - t0:.1f}s", flush=True)
        except SystemExit as e:
            print(f"JOB_EXIT {e.code} {time.time() - t0:.1f}s", flush=True)
        except BaseException:
            traceback.print_exc()
            print(f"JOB_FAIL {time.time() - t0:.1f}s", flush=True)
        finally:
            sys.stdout, sys.stderr = old_out, old_err
            log.close()
            os.replace(path, os.path.join(done, name))
            print(f"worker: finished {name}", flush=True)


if __name__ == "__main__":
    main()
