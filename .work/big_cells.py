"""9.6M-book sweep cells: prep the site store once, then sample
local[32] / local[8] / local[2] with the same worker + jsonl format.
Third job size for the amortization trend (600k -> 2.4M -> 9.6M)."""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "sweep_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP")
BOOKS = 9600000
CELLS = [(32, 2400), (8, 3600), (2, 4500)]

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402


def main() -> None:
    env = dict(os.environ, SPARK_SCALING_BOOKS=str(BOOKS),
               SPARK_SCALING_DRIVER_MEM="48g")
    pages = f"/dev/shm/scaling_pages_{BOOKS}"
    if not os.path.isdir(pages):
        t0 = time.time()
        subprocess.run([sys.executable,
                        os.path.join(HERE, "bench_scaling.py"), "--prep"],
                       cwd=HERE, check=True, env=env)
        print(f"PREP done in {time.time() - t0:.0f}s", flush=True)
    for cores, cap in CELLS:
        if os.path.exists(STOP):
            break
        fops = probe_fops()
        print(f"START books={BOOKS} cores={cores} cap={cap}s fops={fops} "
              f"at {time.strftime('%H:%M:%S')}", flush=True)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(HERE, "bench_scaling.py"),
                 "--worker", str(cores)],
                capture_output=True, text=True, cwd=HERE, env=env,
                timeout=cap,
            )
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT cores={cores} after {cap}s", flush=True)
            subprocess.run(["pkill", "-f", "bench_scaling.py --worker"],
                           capture_output=True)
            time.sleep(5)
            continue
        if out.returncode != 0:
            print(f"FAILED rc={out.returncode}\n"
                  + "\n".join(out.stderr.strip().splitlines()[-10:]),
                  flush=True)
            continue
        r = json.loads(out.stdout.strip().splitlines()[-1])
        r["books"] = BOOKS
        r["probe_fops"] = fops
        with open(RAW, "a") as f:
            f.write(json.dumps(r) + "\n")
        print(f"DONE {json.dumps(r)}", flush=True)
    print("BIG CELLS EXIT", flush=True)


if __name__ == "__main__":
    main()
