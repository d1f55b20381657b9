"""Continuous host-state monitor: one jsonl line per ~5s.

Start-of-run probes miss throttle BURSTS that arrive mid-run — the r5
epoch's signature is 'round 1 clean, round 2 inflated', i.e. any window
longer than a couple of minutes overlaps a burst. This timeline lets a
sample's wall be read against the machine state DURING the run:
machine-wide CPU split (user/sys/idle), disk sectors written/read per
second, and steal time if the hypervisor exposes it.
"""
import json
import os
import time

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "host_timeline.jsonl")


def cpu_line():
    with open("/proc/stat") as f:
        parts = f.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = [int(x) for x in parts[1:9]]
    return vals


def disk_totals():
    rd = wr = 0
    with open("/proc/diskstats") as f:
        for line in f:
            fld = line.split()
            # whole devices only (vda, sda, nvme0n1...), skip partitions
            if fld[2][-1].isdigit() and not fld[2].startswith("nvme"):
                continue
            rd += int(fld[5])
            wr += int(fld[9])
    return rd, wr


def main():
    prev_cpu = cpu_line()
    prev_dsk = disk_totals()
    prev_t = time.time()
    while True:
        time.sleep(5)
        cpu = cpu_line()
        dsk = disk_totals()
        t = time.time()
        dt = t - prev_t
        d = [b - a for a, b in zip(prev_cpu, cpu)]
        tot = sum(d) or 1
        rec = {
            "ts": round(t, 1),
            "user_pct": round(100 * (d[0] + d[1]) / tot, 1),
            "sys_pct": round(100 * d[2] / tot, 1),
            "idle_pct": round(100 * d[3] / tot, 1),
            "iowait_pct": round(100 * d[4] / tot, 1),
            "steal_pct": round(100 * d[7] / tot, 1),
            "disk_rd_mbs": round((dsk[0] - prev_dsk[0]) * 512 / dt / 1e6, 1),
            "disk_wr_mbs": round((dsk[1] - prev_dsk[1]) * 512 / dt / 1e6, 1),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        prev_cpu, prev_dsk, prev_t = cpu, dsk, t


if __name__ == "__main__":
    main()
