"""Aggregate memory-bandwidth probe: N concurrent streaming copies.

If the box's bandwidth saturates (aggregate GB/s at 8 workers ~= 2-3x
the 1-worker rate instead of 8x), an 8-core cell is bandwidth-starved
in a way a 2-core cell is not — the mechanism behind the pair-end
epoch asymmetry documented in BENCH/BASELINE.md. Prints one JSON line.
"""
import json
import sys
import time
from multiprocessing import Process, Queue


def worker(q: Queue, mb: int, reps: int) -> None:
    import numpy as np
    a = np.ones(mb * 131072, dtype=np.float64)
    best = 0.0
    for _ in range(reps):
        t0 = time.perf_counter()
        b = a.copy()
        dt = time.perf_counter() - t0
        best = max(best, (2 * a.nbytes / dt) / 1e9)
        del b
    q.put(best)


def probe(n: int, mb: int = 256, reps: int = 4) -> float:
    q: Queue = Queue()
    ps = [Process(target=worker, args=(q, mb, reps)) for _ in range(n)]
    for p in ps:
        p.start()
    vals = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return round(sum(vals), 2)


if __name__ == "__main__":
    ns = [int(x) for x in (sys.argv[1:] or ["1", "2", "8"])]
    out = {f"agg_gbs_{n}w": probe(n) for n in ns}
    out["ts"] = time.strftime("%H:%M:%S")
    print(json.dumps(out))
