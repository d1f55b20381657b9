import json, sys, glob, os
from collections import defaultdict
d = glob.glob("/dev/shm/spark-events/eventlog_v2_*")[0]
f = [p for p in glob.glob(d+"/events_*")]
lines = []
for p in f:
    lines.extend(open(p).read().splitlines())
jobs = {}
for line in lines:
    try: e = json.loads(line)
    except Exception: continue
    t = e.get("Event")
    if t == "SparkListenerJobStart":
        props = e.get("Properties") or {}
        jobs[e["Job ID"]] = {"start": e["Submission Time"],
                             "cs": props.get("callSite.short",""),
                             "desc": props.get("spark.job.description","")[:90]}
    elif t == "SparkListenerJobEnd" and e["Job ID"] in jobs:
        jobs[e["Job ID"]]["end"] = e["Completion Time"]
agg = defaultdict(lambda: [0,0.0])
for jid, j in sorted(jobs.items()):
    if "end" not in j: continue
    dur = (j["end"]-j["start"])/1000.0
    agg[j["cs"]][0]+=1; agg[j["cs"]][1]+=dur
print("total jobs:", len(jobs))
for k,(n,s) in sorted(agg.items(), key=lambda x:-x[1][1]):
    print(f"{s:8.2f}s  n={n:4d}  {k}")
# also print job timeline gaps (driver idle between jobs)
ordered = [j for _,j in sorted(jobs.items()) if "end" in j]
gap = sum(max(0, ordered[i+1]["start"]-ordered[i]["end"]) for i in range(len(ordered)-1))/1000.0
busy = sum((j["end"]-j["start"])/1000.0 for j in ordered)
print(f"job busy {busy:.1f}s, inter-job driver gaps {gap:.1f}s")
