"""Same-epoch A/B of the 4x2 scale cell: r4 code vs HEAD.

Round 5's HEAD confirmation samples of the 2.4M-book 4x2 local-cluster
cell all landed 477-742s vs the r4 best 157.4s, while the 1x2 end
reproduced its r4 best (big round 395.7s vs 396.2s) in a calm epoch.
Theory says HEAD is plan-identical on this job (the r5 fast-round gate,
geometric part fold and robots full-rules are all inert at 2 rounds /
no robots table), so the gap should be host-epoch noise — but the honest
test is interleaved: run r4 and HEAD back-to-back in the SAME epoch,
alternating order each cycle so drift cancels. If the two arms track
within noise, the r4 bests stand for HEAD; if r4 is consistently ~3x
faster in-pair, bisect.

r4 arm = worktree at 4568106 (/tmp/r4tree); bench_scaling derives
PYTHONPATH and cwd from its own path, so each arm runs its own engine.
Both arms share the prepped /dev/shm page store (generator unchanged).
HEAD samples also append to BENCH/cluster_runs.jsonl (same protocol as
the confirmation loop); pairs go to .work/ab4x2.jsonl.
"""
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RAW = os.path.join(HERE, "BENCH", "cluster_runs.jsonl")
AB = os.path.join(HERE, ".work", "ab4x2.jsonl")
STOP = os.path.join(HERE, ".work", "STOP_AB")
R4_SHA = "4568106"
R4_TREE = "/tmp/r4tree"

sys.path.insert(0, os.path.join(HERE, ".work"))
from cell_loop import probe_fops  # noqa: E402
from cluster_cells import _reap  # noqa: E402

ENV = dict(
    SPARK_SCALING_BOOKS="2400000",
    SPARK_SCALING_EXECUTORS="4",
    SPARK_SCALING_EXEC_CORES="2",
    SPARK_SCALING_EXEC_MEM_MB="10240",
    SPARK_SCALING_SHUFFLE="64",
    SPARK_SCALING_STORE_LEVEL="none",
    SPARK_SCALING_READER_BATCH="4",
    SPARK_SCALING_LOCAL_DIR="/tmp/spark-local",
)
CAP_S = 900


def _ensure_r4tree() -> None:
    if os.path.isdir(os.path.join(R4_TREE, "distributed_web_scrapper_and_crawler_c__spark")):
        return
    subprocess.run(["git", "-C", HERE, "worktree", "add", "--detach",
                    R4_TREE, R4_SHA], check=True)


def _run_arm(arm: str) -> dict | None:
    tree = R4_TREE if arm == "r4" else HERE
    env = dict(os.environ, **ENV)
    pre = probe_fops()
    print(f"START arm={arm} fops={pre} at {time.strftime('%H:%M:%S')}",
          flush=True)
    t0 = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(tree, "bench_scaling.py"),
             "--worker", "8"],
            capture_output=True, text=True, cwd=tree, env=env, timeout=CAP_S,
        )
    except subprocess.TimeoutExpired:
        print(f"TIMEOUT arm={arm} after {CAP_S}s", flush=True)
        _reap()
        return {"arm": arm, "timeout_s": CAP_S, "probe_fops": pre,
                "probe_fops_post": probe_fops()}
    post = probe_fops()
    if out.returncode != 0:
        print(f"FAILED arm={arm} rc={out.returncode}\n"
              + "\n".join(out.stderr.strip().splitlines()[-12:]), flush=True)
        _reap()
        return None
    r = json.loads(out.stdout.strip().splitlines()[-1])
    r["books"] = 2400000
    r["probe_fops"] = pre
    r["probe_fops_post"] = post
    r["arm"] = arm
    r["elapsed_s"] = round(time.time() - t0, 1)
    print(f"DONE {json.dumps(r)}", flush=True)
    if arm == "head":
        h = dict(r)
        h.pop("arm")
        h.pop("elapsed_s")
        h["head"] = "r5"
        with open(RAW, "a") as f:
            f.write(json.dumps(h) + "\n")
    with open(AB, "a") as f:
        f.write(json.dumps(r) + "\n")
    return r


def main() -> None:
    _ensure_r4tree()
    cycles = int(os.environ.get("AB_CYCLES", "3"))
    for i in range(cycles):
        order = ["r4", "head"] if i % 2 == 0 else ["head", "r4"]
        for arm in order:
            if os.path.exists(STOP):
                print("STOP_AB present, exiting", flush=True)
                return
            _run_arm(arm)
    print("AB EXIT", flush=True)


if __name__ == "__main__":
    main()
