"""Round-4 follow-up cells: the bandwidth-unconstrained N -> 4N pair.

The 4-core-executor pairs put the 4N end at 16 cores, where this single
box's shared memory bandwidth (and its ~20-effective-core VM ceiling)
caps speedup. A 2-core-executor pair (1x2 -> 4x2 = 2 -> 8 cores) keeps
BOTH ends below saturation — if the plan itself scales, this pair is
where >=0.8 should show up. Also repeats the n=1 4.8M 4-core cells to
sharpen their min-wall. Appends to BENCH/cluster_runs.jsonl; loops for
min-wall until DEADLINE or .work/STOP.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP")
DEADLINE = time.time() + float(os.environ.get("CELL_LOOP_HOURS", "2.5")) * 3600

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402
from cluster_cells import _reap  # noqa: E402

# (books, n_executors, exec_cores, exec_mem_mb, shuffle, pin, timeout_s)
CELLS = [
    (2400000, 4, 2, 10240, 64, "", 900),     # 4N end of the 2-core pair
    (2400000, 1, 2, 10240, 64, "", 1800),    # N end
    (4800000, 4, 2, 12288, 64, "ser", 1500),
    (4800000, 1, 2, 12288, 64, "ser", 3000),
    (4800000, 4, 4, 12288, 64, "ser", 900),  # sharpen the n=1 minima
    (4800000, 1, 4, 12288, 64, "ser", 1500),
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
    print("CLUSTER CELLS5 EXIT", flush=True)


if __name__ == "__main__":
    main()
