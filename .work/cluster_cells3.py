"""Priority-ordered executor-scaling cells, looped until DEADLINE.

The north rule grades N -> 4N EXECUTOR efficiency; the ceiling-free pairs on
this ~20-effective-core VM are 1x4 -> 4x4 and 4x1 -> 16x1 (both ends <= 16
cores). Cells are ordered so the decisive, thinnest-sampled cells run first;
the loop then keeps adding interleaved passes (min-wall protocol) until the
deadline or .work/STOP. Every sample carries a probe_fops epoch label.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP")
DEADLINE = time.time() + float(os.environ.get("CELL_LOOP_HOURS", "3.2")) * 3600

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402
from cluster_cells import _reap  # noqa: E402

# (books, n_executors, exec_cores, exec_mem_mb, timeout_s)
CELLS = [
    (2400000, 4, 4, 10240, 1200),   # decisive: calm high end of 1x4 -> 4x4
    (2400000, 16, 1, 5120, 1200),   # cells2 high end (16 JVMs, 16 cores)
    (2400000, 4, 1, 5120, 3000),    # cells2 low end
    (600000, 4, 1, 5120, 900),
    (600000, 16, 1, 5120, 600),
    (2400000, 8, 4, 10240, 1200),   # repass of the 8x4 top end
    (600000, 4, 4, 10240, 600),
    (600000, 8, 4, 10240, 600),
    (2400000, 1, 4, 10240, 2700),   # second sample of the decisive low end
    (2400000, 2, 4, 10240, 1800),
]


def main() -> None:
    while time.time() < DEADLINE and not os.path.exists(STOP):
        for books, n_exec, c, mem, cap in CELLS:
            if time.time() + cap > DEADLINE or os.path.exists(STOP):
                break
            env = dict(os.environ,
                       SPARK_SCALING_BOOKS=str(books),
                       SPARK_SCALING_EXECUTORS=str(n_exec),
                       SPARK_SCALING_EXEC_CORES=str(c),
                       SPARK_SCALING_EXEC_MEM_MB=str(mem))
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
    print("CLUSTER CELLS3 EXIT", flush=True)


if __name__ == "__main__":
    main()
