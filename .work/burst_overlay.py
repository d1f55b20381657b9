"""Overlay confirmation samples on the host timeline.

Parses START/DONE pairs from a confirm-loop log, maps each sample's
[start, start+wall] window onto .work/host_timeline.jsonl, and prints
mean guest-visible user/sys/steal during the run — the per-sample burst
exposure that start-of-run probes cannot capture.
"""
import json
import os
import re
import sys
import time
from datetime import datetime

HERE = os.path.dirname(os.path.abspath(__file__))
TIMELINE = os.path.join(HERE, "host_timeline.jsonl")


def main(log_paths):
    tl = [json.loads(l) for l in open(TIMELINE)]
    today = datetime.now().strftime("%Y-%m-%d")
    for path in log_paths:
        print(f"== {os.path.basename(path)}")
        start_ts = None
        cell = None
        for line in open(path):
            m = re.match(r"START .*cell=(\S+).*at (\d\d:\d\d:\d\d)", line)
            if m:
                cell = m.group(1)
                start_ts = time.mktime(time.strptime(
                    f"{today} {m.group(2)}", "%Y-%m-%d %H:%M:%S"))
                continue
            if line.startswith("DONE ") and start_ts is not None:
                r = json.loads(line[5:])
                w = [p for p in tl
                     if start_ts <= p["ts"] <= start_ts + r["wall_sec"]]
                if not w:
                    print(f"  {cell} wall={r['wall_sec']}s  (no overlap "
                          "with timeline)")
                    continue
                mean = lambda k: sum(p[k] for p in w) / len(w)
                print(f"  {cell} wall={r['wall_sec']:7.1f}s dir="
                      f"{r.get('local_dir','?'):>22} | during run: "
                      f"user {mean('user_pct'):4.1f}% "
                      f"sys {mean('sys_pct'):4.1f}% "
                      f"steal {mean('steal_pct'):4.1f}% "
                      f"(n={len(w)} ticks; peak sys "
                      f"{max(p['sys_pct'] for p in w):.0f}%, peak steal "
                      f"{max(p['steal_pct'] for p in w):.0f}%)")
                start_ts = None


if __name__ == "__main__":
    main(sys.argv[1:] or [os.path.join(HERE, "r5_confirm2c.log")])
