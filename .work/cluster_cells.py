"""Multi-executor scaling cells: the same crawl job on local-cluster[N,4,7g]
— N real executor JVMs at 4 cores each — for N in {1,2,4,8}, at two job
sizes. The N=1 -> N=4 pair (4 -> 16 total cores) is the ceiling-free
N -> 4N EXECUTOR measurement of the north rule; N=2 -> N=8 (8 -> 32) rides
the VM's ~20-effective-core ceiling at the top end. Appends one JSON line
per run to BENCH/cluster_runs.jsonl."""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP")
# (books, n_executors, timeout_s) — interleaved small->large executor counts
CELLS = [
    (600000, 1, 900), (600000, 4, 600), (600000, 2, 700), (600000, 8, 600),
    (2400000, 1, 2400), (2400000, 4, 1200), (2400000, 2, 1800),
    (2400000, 8, 1200),
]

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402


def main() -> None:
    for books, n_exec, cap in CELLS:
        if os.path.exists(STOP):
            break
        env = dict(os.environ,
                   SPARK_SCALING_BOOKS=str(books),
                   SPARK_SCALING_EXECUTORS=str(n_exec),
                   SPARK_SCALING_EXEC_CORES="4",
                   SPARK_SCALING_EXEC_MEM_MB="7168")
        fops = probe_fops()
        print(f"START books={books} executors={n_exec} cap={cap}s "
              f"fops={fops} at {time.strftime('%H:%M:%S')}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench_scaling.py"),
                 "--worker", str(4 * n_exec)],
                capture_output=True, text=True, cwd=HERE, env=env,
                timeout=cap,
            )
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT executors={n_exec} after {cap}s", flush=True)
            subprocess.run(["pkill", "-f", "bench_scaling.py --worker"],
                           capture_output=True)
            time.sleep(10)
            continue
        if out.returncode != 0:
            print(f"FAILED rc={out.returncode}\n"
                  + "\n".join(out.stderr.strip().splitlines()[-15:]),
                  flush=True)
            continue
        r = json.loads(out.stdout.strip().splitlines()[-1])
        r["books"] = books
        r["probe_fops"] = fops
        with open(RAW, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(f"DONE {json.dumps(r)}", flush=True)
    print("CLUSTER CELLS EXIT", flush=True)


if __name__ == "__main__":
    main()
