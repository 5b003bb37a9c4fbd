#!/usr/bin/env python3
"""Timeline view of a Spark event log: jobs in submission order with the
DRIVER GAP before each one (time since the previous job ended with no job
running), so driver-side work (planning, commit protocol, footer reads)
between jobs becomes visible.

Usage: tools/evgaps.py <decompressed-eventlog> [mingap_sec]
"""
import json, sys, collections

path = sys.argv[1]
mingap = float(sys.argv[2]) if len(sys.argv) > 2 else 0.05

jobs = {}
for line in open(path):
    try:
        e = json.loads(line)
    except json.JSONDecodeError:
        continue
    t = e.get("Event")
    if t == "SparkListenerJobStart":
        props = e.get("Properties") or {}
        jobs[e["Job ID"]] = {
            "start": e["Submission Time"],
            "site": props.get("callSite.short", "?"),
            "desc": props.get("spark.job.description", ""),
            "end": None,
        }
    elif t == "SparkListenerJobEnd":
        if e["Job ID"] in jobs:
            jobs[e["Job ID"]]["end"] = e["Completion Time"]

rows = sorted((j["start"], j["end"] or j["start"], jid, j)
              for jid, j in jobs.items())
if not rows:
    sys.exit("no jobs")
t0 = rows[0][0]
# sweep: compute gap before each job vs max end seen so far
maxend = rows[0][0]
gaps = []
print(f"{'job':>4} {'t+':>8} {'gap':>7} {'dur':>7}  site")
for start, end, jid, j in rows:
    gap = (start - maxend) / 1000.0
    dur = (end - start) / 1000.0
    if gap >= mingap or dur >= 0.25:
        label = (j["desc"] or j["site"])[:90]
        print(f"{jid:>4} {(start-t0)/1000.0:>8.2f} {gap:>7.2f} {dur:>7.2f}  {label}")
    if gap > 0:
        gaps.append((gap, jid, j["site"]))
    maxend = max(maxend, end)
total_gap = sum(g for g, _, _ in gaps)
span = (max(r[1] for r in rows) - t0) / 1000.0
print(f"\n== span {span:.2f}s, total driver gap {total_gap:.2f}s "
      f"across {len(gaps)} gaps")
