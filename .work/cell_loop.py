"""Epoch-aware sweep-cell runner: cycles (books, cores) cells with the
interleaved min-wall protocol for up to DEADLINE_H hours, recording a
syscall-throughput probe alongside every sample (the host's throttle
epochs only manifest under syscall load, so an idle /proc/stat check
cannot detect them — the probe gives each sample an honest epoch label).
Per-run timeouts stop a deeply degraded epoch from capturing the session;
a timed-out run records nothing (min-wall over other trials stands).

Stop early: touch .work/STOP
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "sweep_runs.jsonl")
STOP = os.path.join(HERE, ".work", "STOP")
DEADLINE = time.time() + float(os.environ.get("CELL_LOOP_HOURS", "4.0")) * 3600

# (books, cores, timeout_sec) — caps ~= 6-7x the calm-best estimate
CELLS = [
    (2400000, 8, 1800),
    (600000, 2, 900),
    (2400000, 2, 3000),
    (600000, 32, 600),
    (2400000, 32, 1500),
    (600000, 8, 700),
]


def probe_fops(seconds: float = 2.0) -> int:
    """File create+write+unlink ops/sec on /dev/shm — a healthy epoch
    measured ~110k/s in round 4; throttle epochs collapse this."""
    d = "/dev/shm/.probe"
    os.makedirs(d, exist_ok=True)
    t0 = time.time()
    n = 0
    payload = b"x" * 256
    while time.time() - t0 < seconds:
        p = os.path.join(d, f"f{n % 64}")
        with open(p, "wb") as f:
            f.write(payload)
        os.unlink(p)
        n += 1
    return int(n / seconds)


def main() -> None:
    while time.time() < DEADLINE and not os.path.exists(STOP):
        for books, cores, cap in CELLS:
            if time.time() > DEADLINE or os.path.exists(STOP):
                break
            fops_before = probe_fops()
            env = dict(os.environ, SPARK_SCALING_BOOKS=str(books))
            print(f"START books={books} cores={cores} cap={cap}s "
                  f"fops={fops_before} at {time.strftime('%H:%M:%S')}",
                  flush=True)
            try:
                out = subprocess.run(
                    [sys.executable, os.path.join(HERE, "bench_scaling.py"),
                     "--worker", str(cores)],
                    capture_output=True, text=True, cwd=HERE, env=env,
                    timeout=cap,
                )
            except subprocess.TimeoutExpired:
                print(f"TIMEOUT books={books} cores={cores} after {cap}s "
                      f"(degraded epoch; no sample recorded)", flush=True)
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
            r["books"] = books
            r["probe_fops"] = fops_before
            with open(RAW, "a") as f:
                f.write(json.dumps(r) + "\n")
            print(f"DONE {json.dumps(r)}", flush=True)
    print("LOOP EXIT", flush=True)


if __name__ == "__main__":
    main()
