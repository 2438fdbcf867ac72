"""Memory-bandwidth saturation evidence for the scaling protocol.

BENCH/BASELINE.md discards the local[8] -> local[32] pair as a
single-box DRAM-saturation artifact; VERDICT r02 asked for measured
evidence instead of a plausible argument. This runs a STREAM-style
aggregate-bandwidth probe: K pinned worker processes each stream a
256 MiB numpy triad (a[:] = b + s*c — two reads + one write per
element, the classic STREAM kernel) and we report the AGGREGATE
GB/s versus K. If the box's aggregate bandwidth stops growing well
before 32 workers, a bandwidth-bound stage cannot speed up 8 -> 32
no matter how the job is written — which is exactly what the
discarded pair shows.

Run:  python scripts/membw.py [out.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

ARRAY_MB = 256   # per-worker working set, far beyond L3
ITERS = 8
BYTES_PER_ELEM_MOVED = 24  # triad: read b, read c, write a (8B doubles)


def _worker(core: int, out_q: mp.Queue) -> None:
    os.sched_setaffinity(0, {core})
    n = ARRAY_MB * 1024 * 1024 // 8
    a = np.zeros(n)
    b = np.random.default_rng(core).random(n)
    c = np.random.default_rng(core + 1).random(n)
    np.add(b, 2.0 * c, out=a)  # touch all pages before timing
    t0 = time.perf_counter()
    for _ in range(ITERS):
        np.multiply(c, 2.0, out=a)
        np.add(a, b, out=a)
    wall = time.perf_counter() - t0
    # two kernels per iter, each moving ~3 arrays' worth of traffic is
    # overcounting (the temporary stays in a); count conservatively:
    # per iter = multiply (read c, write a) + add (read a+b, write a)
    moved = ITERS * n * 8 * 5
    out_q.put(moved / wall / 1e9)


def measure(k: int) -> float:
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_worker, args=(i, q)) for i in range(k)]
    for p in procs:
        p.start()
    rates = [q.get() for _ in procs]
    for p in procs:
        p.join()
    return float(sum(rates))


def main() -> None:
    out = {}
    for k in (1, 2, 4, 8, 16, 32):
        runs = [measure(k) for _ in range(3)]
        out[k] = round(float(np.median(runs)), 2)
        print(f"{k:>2} workers: {out[k]:8.2f} GB/s aggregate "
              f"({out[k]/k:6.2f} GB/s per worker)")
    sat8 = out[32] / out[8]
    print(f"\naggregate bandwidth 8 -> 32 workers grows {sat8:.2f}x "
          f"(perfect scaling would be 4.00x)")
    payload = {"aggregate_gbps": out, "growth_8_to_32": round(sat8, 3),
               "array_mb": ARRAY_MB, "kernel": "stream-triad (numpy)"}
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH/MEMBW.json"
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
