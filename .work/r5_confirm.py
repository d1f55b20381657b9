"""Round-5 HEAD confirmation of the headline N->4N pair.

The >=0.8 efficiency claim (2.4M books, 1x2 -> 4x2 executors on
local-cluster) was measured with round-4 code. Round 5 changed the drain
loop (geometric part-union folding) — the scale job is 2 rounds so the
fold never fires (threshold >= 8 parts), but the honest check is to
re-run the pair at HEAD and confirm the walls still land at/near the
recorded bests. One cycle per invocation (N end first), appending to
BENCH/cluster_runs.jsonl in the same format as cluster_cells6.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402
from cluster_cells import _reap  # noqa: E402

# (books, n_executors, exec_cores, exec_mem_mb, shuffle, timeout_s)
CELLS = [
    (2400000, 1, 2, 10240, 64, 1500),
    (2400000, 4, 2, 10240, 64, 900),
]

# R5_BOOKS=4800000 switches to the second headline pair (same shapes,
# longer caps — the 4.8M 1x2 best is ~934s).
if os.environ.get("R5_BOOKS") == "4800000":
    CELLS = [
        (4800000, 1, 2, 10240, 64, 2400),
        (4800000, 4, 2, 10240, 64, 1200),
    ]


def _prep(books: int) -> None:
    path = f"/dev/shm/scaling_pages_{books}"
    if os.path.isdir(path):
        return
    env = dict(os.environ, SPARK_SCALING_BOOKS=str(books))
    print(f"PREP {books}", flush=True)
    subprocess.run([sys.executable, os.path.join(HERE, "bench_scaling.py"),
                    "--prep"], cwd=HERE, env=env, check=True)


def _wait_calm(min_fops: int, max_wait_s: int) -> int:
    """Probe host speed; in a throttled epoch (fops below min_fops) sleep
    and re-probe instead of burning 10-25 min on a sample that min-wall
    will discard anyway. Returns the last probe value (the cell runs
    regardless once the wait budget is spent — a labeled inflated sample
    still adds to the run count)."""
    deadline = time.time() + max_wait_s
    fops = probe_fops()
    while fops < min_fops and time.time() < deadline:
        print(f"THROTTLED fops={fops} < {min_fops}, waiting "
              f"({int(deadline - time.time())}s budget left)", flush=True)
        time.sleep(120)
        fops = probe_fops()
    return fops


def main() -> None:
    cycles = int(os.environ.get("R5_CYCLES", "1"))
    min_fops = int(os.environ.get("R5_MIN_FOPS", "62000"))
    max_wait_s = int(os.environ.get("R5_MAX_WAIT_S", "1800"))
    for books, *_rest in CELLS:
        _prep(books)
    for _ in range(cycles):
        for books, n_exec, c, mem, shuf, cap in CELLS:
            env = dict(os.environ,
                       SPARK_SCALING_BOOKS=str(books),
                       SPARK_SCALING_EXECUTORS=str(n_exec),
                       SPARK_SCALING_EXEC_CORES=str(c),
                       SPARK_SCALING_EXEC_MEM_MB=str(mem),
                       SPARK_SCALING_SHUFFLE=str(shuf),
                       SPARK_SCALING_STORE_LEVEL="none",
                       SPARK_SCALING_READER_BATCH="4",
                       SPARK_SCALING_LOCAL_DIR="/tmp/spark-local")
            fops = _wait_calm(min_fops, max_wait_s)
            print(f"START books={books} cell={n_exec}x{c} cap={cap}s "
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
            r["head"] = "r5"
            with open(RAW, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"DONE {json.dumps(r)}", flush=True)
    print("R5 CONFIRM EXIT", flush=True)


if __name__ == "__main__":
    main()
