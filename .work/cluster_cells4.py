"""Round-4 big-cell loop: the decisive N -> 4N executor pairs at larger
job sizes, with data-scaled shuffle partitions (SPARK_SCALING_SHUFFLE).

Motivation: the ceiling-free pairs (1x4 -> 4x4) rise 0.45 -> 0.67 raw from
600k to 2.4M books; the Amdahl amortization claim predicts they keep rising
with pages-per-round. The 9.6M 4x4 cell was spill-bound at the old
cores-default 16 shuffle partitions — re-measured here at 128 (AQE
coalesces any excess). Uncached page store (none) everywhere: the honest
analogue of a never-resident 100TB Iceberg store. Appends to
BENCH/cluster_runs.jsonl; loops until DEADLINE or .work/STOP.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP")
DEADLINE = time.time() + float(os.environ.get("CELL_LOOP_HOURS", "3.0")) * 3600

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402
from cluster_cells import _reap  # noqa: E402

# (books, n_executors, exec_cores, exec_mem_mb, shuffle, pin, timeout_s)
CELLS = [
    (9600000, 4, 4, 16384, 128, "ser", 1500),   # spill-fix test: 4N end
    (4800000, 4, 4, 12288, 64, "ser", 1200),    # new size: 4N end
    (4800000, 1, 4, 12288, 64, "ser", 2700),    # new size: N end
    (2400000, 4, 4, 10240, 64, "", 900),        # sharpen the 2.4M minima
    (9600000, 1, 4, 16384, 128, "ser", 3600),   # N end of the 9.6M pair
    (2400000, 1, 4, 10240, 64, "", 1800),
]


def _prep(books: int) -> None:
    path = f"/dev/shm/scaling_pages_{books}"
    if os.path.isdir(path):
        return
    env = dict(os.environ, SPARK_SCALING_BOOKS=str(books))
    print(f"PREP {books}", flush=True)
    subprocess.run([sys.executable, os.path.join(HERE, "bench_scaling.py"),
                    "--prep"], cwd=HERE, env=env, check=True)


def main() -> None:
    for books, *_rest in CELLS:
        _prep(books)
    while time.time() < DEADLINE and not os.path.exists(STOP):
        for books, n_exec, c, mem, shuf, pin, cap in CELLS:
            if time.time() + cap > DEADLINE or os.path.exists(STOP):
                break
            env = dict(os.environ,
                       SPARK_SCALING_BOOKS=str(books),
                       SPARK_SCALING_EXECUTORS=str(n_exec),
                       SPARK_SCALING_EXEC_CORES=str(c),
                       SPARK_SCALING_EXEC_MEM_MB=str(mem),
                       SPARK_SCALING_SHUFFLE=str(shuf),
                       SPARK_SCALING_STORE_LEVEL="none",
                       SPARK_SCALING_READER_BATCH="4",
                       SPARK_SCALING_LOCAL_DIR="/tmp/spark-local")
            if pin:
                env["SPARK_SCALING_PIN_LEVEL"] = pin
            fops = probe_fops()
            print(f"START books={books} cell={n_exec}x{c} mem={mem} "
                  f"shuf={shuf} pin={pin or 'default'} cap={cap}s "
                  f"fops={fops} at {time.strftime('%H:%M:%S')}", flush=True)
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(HERE, "bench_scaling.py"),
                     "--worker", str(n_exec * c)],
                    capture_output=True, text=True, cwd=HERE, env=env,
                    timeout=cap,
                )
            except subprocess.TimeoutExpired:
                print(f"TIMEOUT {books} {n_exec}x{c} after {cap}s", flush=True)
                _reap()
                continue
            if out.returncode != 0:
                print(f"FAILED rc={out.returncode}\n"
                      + "\n".join(out.stderr.strip().splitlines()[-15:]),
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
    print("CLUSTER CELLS4 EXIT", flush=True)


if __name__ == "__main__":
    main()
