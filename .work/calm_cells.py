"""Run specific (books, cores) sweep cells sequentially in a calm-host
window, appending each result line to BENCH/sweep_runs.jsonl in the same
format --sweep uses. Cells chosen to de-pollute the thrash-epoch-only
cells and to add the ceiling-free 2->8 pair at 2.4M books."""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "sweep_runs.jsonl")
CELLS = [(600000, 32), (2400000, 8), (600000, 2), (2400000, 2)]

for books, cores in CELLS:
    env = dict(os.environ, SPARK_SCALING_BOOKS=str(books))
    t0 = time.time()
    print(f"START books={books} cores={cores} at {time.strftime('%H:%M:%S')}",
          flush=True)
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "bench_scaling.py"),
         "--worker", str(cores)],
        capture_output=True, text=True, cwd=HERE, env=env,
    )
    if out.returncode != 0:
        print(f"FAILED rc={out.returncode}\n"
              + "\n".join(out.stderr.strip().splitlines()[-15:]), flush=True)
        continue
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["books"] = books
    with open(RAW, "a") as f:
        f.write(json.dumps(r) + "\n")
    print(f"DONE {json.dumps(r)}", flush=True)
print("ALL CELLS DONE", flush=True)
