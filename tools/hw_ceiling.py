"""Hardware scaling ceiling for the 2→8-pinned-core bench pair.

The bench's scaling-efficiency number divides per-core throughput at 8
pinned cores by per-core throughput at 2 pinned cores. On this shared
box that ratio has a HARDWARE component independent of Spark: 8 active
cores contend for memory bandwidth / LLC / (possibly SMT-sibling)
resources that 2 cores don't, so even a Spark-free, shuffle-free,
perfectly parallel decode loop scales sublinearly. This tool measures
that ceiling with the engine's own decode kernel (imagecodec.decode +
luma + phash — the exact per-image work the validation suite spends its
time in), run as K taskset-pinned worker processes with NO coordination:
no JVM, no serde, no scheduler, no shuffle — pure per-core arithmetic.

    python tools/hw_ceiling.py            # prints JSON: thr@2, thr@8, ceiling
    python tools/hw_ceiling.py --_worker  # internal per-process loop

Efficiency reported by bench.py should be read AGAINST this ceiling:
engine_eff / hw_ceiling is the fraction of physically-available scaling
the engine achieves.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SECONDS = float(os.environ.get("HW_CEILING_SECONDS", "6"))
LEVELS = (2, 8)


def _payloads():
    import numpy as np

    from smcchecker_spark import imagecodec as ic

    rng = np.random.default_rng(7)
    out = []
    for i in range(8):
        h, w = 96 + 8 * i, 128 + 8 * i
        arr = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out.append(ic.encode_png(arr) if i % 2 else ic.encode_fake_lossy(arr))
    return out


def _worker_loop(seconds: float) -> int:
    from smcchecker_spark import imagecodec as ic

    payloads = _payloads()
    n = 0
    t0 = time.time()
    while time.time() - t0 < seconds:
        for p in payloads:
            arr, _fmt = ic.decode_image(p)
            ic.phash64(arr)  # includes the luma matmul
            n += 1
    return n


def _run_level(k: int) -> float:
    """Total images/sec from k pinned, independent worker processes."""
    procs = []
    for i in range(k):
        procs.append(
            subprocess.Popen(
                ["taskset", "-c", str(i), sys.executable,
                 os.path.abspath(__file__), "--_worker"],
                stdout=subprocess.PIPE, text=True,
                env=dict(os.environ, HW_CEILING_SECONDS=str(SECONDS)),
            )
        )
    total = 0.0
    for p in procs:
        out, _ = p.communicate(timeout=600)
        total += float(out.strip().splitlines()[-1])
    return total


def main() -> None:
    if "--_worker" in sys.argv:
        # warm-up (JIT-free python, but page in numpy/zlib), then timed
        _worker_loop(0.5)
        n = _worker_loop(SECONDS)
        print(n / SECONDS)
        return
    if "--_level" in sys.argv:
        # single-level probe for bench.py's per-round same-window control
        k = int(sys.argv[sys.argv.index("--_level") + 1])
        print(_run_level(k))
        return
    thr = {k: _run_level(k) for k in LEVELS}
    ceiling = (thr[LEVELS[1]] / thr[LEVELS[0]]) / (LEVELS[1] / LEVELS[0])
    print(json.dumps({
        "kernel": "imagecodec decode+luma+phash, independent pinned processes",
        "seconds_per_level": SECONDS,
        "images_per_sec": {str(k): round(v, 1) for k, v in thr.items()},
        "per_core": {str(k): round(v / k, 1) for k, v in thr.items()},
        "hw_scaling_ceiling": round(ceiling, 4),
    }))


if __name__ == "__main__":
    main()
