"""9.6M-page executor-scaling cells — the job-size end point of the
amortization experiment.

The 600k -> 2.4M trend shows N -> 4N executor efficiency rising with
pages-per-round (1x4 -> 4x4: 0.19 -> 0.55; 4x1 -> 16x1: 0.64 at 2.4M).
This runs the same two ceiling-free pairs at 9.6M books (~9.7M pages) to
test whether the trend continues toward the >=0.8 target.

The 9.6M site needs two I/O settings the smaller cells didn't (first
attempt OOM-looped executors): 4-row columnar batches (14 file-adjacent
~90MB category mega-pages -> a 128-row batch is ~1.3GB on-heap) and a
DISK_ONLY page-store cache (~30GB raw html exceeds aggregate executor
storage memory; tmpfs-backed disk is still RAM-speed bytes). A 2.4M
verification pair runs under the SAME settings at the end of each pass so
the cross-size trend has like-configured points.

Decisive pair first; loops for second samples until DEADLINE or
.work/STOP96.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP96")
FAILLOG = os.path.join(HERE, ".work", "cells96_fail.log")
DEADLINE = time.time() + float(os.environ.get("CELL_LOOP_HOURS", "2.6")) * 3600

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402
from cluster_cells import _reap  # noqa: E402

# (books, n_executors, exec_cores, exec_mem_mb, timeout_s). EVERY cell is
# (re)measured under the one config that fits every size (store=none,
# real-disk spill, 4-row reader batches): the cross-size table must compare
# like-configured cells. 9.6M decisive pair first.
CELLS = [
    # decisive 4-core-executor N vs 4N series across all three sizes first.
    # 9.6M needs 16g executor heaps: the 14 ~90MB category mega-page rows
    # OOM a 10g heap in the scan's UnsafeWriter.grow (observed, exec 0
    # stderr of app-20260817222809); heap size is held equal WITHIN each
    # N-vs-4N pair, which is what efficiency compares.
    (9600000, 4, 4, 16384, 1800),
    (9600000, 1, 4, 16384, 3600),
    (2400000, 4, 4, 10240, 900),
    (2400000, 1, 4, 10240, 1200),
    (600000, 4, 4, 10240, 400),
    (600000, 1, 4, 10240, 700),
    # 1-core-executor series second (only if budget remains; no 9.6M row —
    # 16 x 16g heaps cannot fit the box)
    (2400000, 16, 1, 5120, 1000),
    (2400000, 4, 1, 5120, 1500),
    (600000, 16, 1, 5120, 500),
    (600000, 4, 1, 5120, 800),
]


def main() -> None:
    while time.time() < DEADLINE and not os.path.exists(STOP):
        for books, n_exec, c, mem, cap in CELLS:
            if time.time() + cap > DEADLINE or os.path.exists(STOP):
                break
            # store=none + real-disk spill: the only config that fits EVERY
            # size on this box. The tmpfs "disk" store at 9.6M (~30GB raw
            # html) plus 80GB of executor heaps drew the kernel OOM-killer
            # (dmesg global_oom) — cached bytes on tmpfs ARE resident RAM.
            # Re-scanning the parquet store each round is also the honest
            # 100TB-Iceberg behavior: a real page store is never cached.
            env = dict(os.environ,
                       SPARK_SCALING_BOOKS=str(books),
                       SPARK_SCALING_EXECUTORS=str(n_exec),
                       SPARK_SCALING_EXEC_CORES=str(c),
                       SPARK_SCALING_EXEC_MEM_MB=str(mem),
                       SPARK_SCALING_READER_BATCH="4",
                       SPARK_SCALING_STORE_LEVEL="none",
                       SPARK_SCALING_LOCAL_DIR="/tmp/spark-local",
                       SPARK_SCALING_DRIVER_MEM="12g")
            fops = probe_fops()
            print(f"START books={books} cell={n_exec}x{c} mem={mem} "
                  f"cap={cap}s fops={fops} at {time.strftime('%H:%M:%S')}",
                  flush=True)
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(HERE, "bench_scaling.py"),
                     "--worker", str(n_exec * c)],
                    capture_output=True, text=True, cwd=HERE, env=env,
                    timeout=cap,
                )
            except subprocess.TimeoutExpired:
                print(f"TIMEOUT {n_exec}x{c} after {cap}s", flush=True)
                _reap()
                continue
            if out.returncode != 0:
                with open(FAILLOG, "a") as f:
                    f.write(f"==== {books} {n_exec}x{c} rc={out.returncode} "
                            f"{time.strftime('%H:%M:%S')}\n{out.stderr}\n")
                print(f"FAILED rc={out.returncode} (full stderr -> "
                      f"{FAILLOG})\n"
                      + "\n".join(out.stderr.strip().splitlines()[-8:]),
                      flush=True)
                _reap()
                continue
            r = json.loads(out.stdout.strip().splitlines()[-1])
            r["books"] = books
            r["probe_fops"] = fops
            with open(RAW, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"DONE {json.dumps(r)}", flush=True)
        else:
            continue
        break
    print("CELLS96 EXIT", flush=True)


if __name__ == "__main__":
    main()
