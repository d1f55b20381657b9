"""Ceiling-free N -> 4N EXECUTOR pair with 1-core executors:
local-cluster[4,1,5g] vs local-cluster[16,1,5g] (4 -> 16 total cores, both
ends below the VM's ~20-effective-core ceiling), at two job sizes. 16
separate 1-core executor JVMs is the closest sandbox shape to "add 12
nodes to a 4-node cluster". Appends to BENCH/cluster_runs.jsonl."""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP")
CELLS = [  # (books, n_executors, timeout_s)
    (600000, 4, 900), (600000, 16, 600),
    (2400000, 4, 2400), (2400000, 16, 1200),
]

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402
from cluster_cells import _reap  # noqa: E402


def main() -> None:
    for books, n_exec, cap in CELLS:
        if os.path.exists(STOP):
            break
        env = dict(os.environ,
                   SPARK_SCALING_BOOKS=str(books),
                   SPARK_SCALING_EXECUTORS=str(n_exec),
                   SPARK_SCALING_EXEC_CORES="1",
                   SPARK_SCALING_EXEC_MEM_MB="5120")
        fops = probe_fops()
        print(f"START books={books} executors={n_exec}x1 cap={cap}s "
              f"fops={fops} at {time.strftime('%H:%M:%S')}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench_scaling.py"),
                 "--worker", str(n_exec)],
                capture_output=True, text=True, cwd=HERE, env=env,
                timeout=cap,
            )
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT executors={n_exec} after {cap}s", flush=True)
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
    print("CLUSTER CELLS2 EXIT", flush=True)


if __name__ == "__main__":
    main()
