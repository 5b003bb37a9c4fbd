#!/usr/bin/env python3
"""Parse a Spark event log: per-job wall time + call site, grouped.

Usage: tools/evlog.py <eventlog-file> [minsec]
"""
import json, sys, collections

path = sys.argv[1]
minsec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

jobs = {}
stages = {}
for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    t = e.get("Event")
    if t == "SparkListenerJobStart":
        jid = e["Job ID"]
        props = e.get("Properties") or {}
        site = props.get("callSite.short", "?")
        desc = props.get("spark.job.description", "")
        jobs[jid] = {"start": e["Submission Time"], "site": site,
                     "desc": desc, "end": None,
                     "stages": [s["Stage ID"] for s in e.get("Stage Infos", [])]}
    elif t == "SparkListenerJobEnd":
        jid = e["Job ID"]
        if jid in jobs:
            jobs[jid]["end"] = e["Completion Time"]
    elif t == "SparkListenerStageCompleted":
        si = e["Stage Info"]
        stages[si["Stage ID"]] = {
            "name": si["Stage Name"],
            "ms": (si.get("Completion Time", 0) or 0) - (si.get("Submission Time", 0) or 0),
            "tasks": si.get("Number of Tasks", 0),
        }

total = 0.0
bysite = collections.Counter()
rows = []
for jid, j in sorted(jobs.items()):
    if j["end"] is None:
        continue
    sec = (j["end"] - j["start"]) / 1000.0
    total += sec
    key = j["desc"] or j["site"]
    bysite[key] += sec
    rows.append((jid, sec, key))

print(f"== total job wall {total:.2f}s over {len(rows)} jobs")
print("\n== by call site / description:")
for k, v in bysite.most_common(30):
    print(f"{v:8.2f}s  {k}")
print("\n== slowest individual jobs:")
for jid, sec, key in sorted(rows, key=lambda r: -r[1])[:25]:
    st = [stages.get(s) for s in jobs[jid]["stages"] if s in stages]
    stname = st[0]["name"].split("\n")[0][:60] if st else ""
    print(f"job {jid:4d} {sec:8.2f}s  {key}  [{stname}]")
