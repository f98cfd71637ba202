#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall time grouped by job
description, plus the gaps between jobs (driver-side work).

Usage: python3 tools/analyze_eventlog.py <eventlog file> [minSec]
"""
import json, sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    min_sec = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
    jobs = {}
    app_start = app_end = None
    for line in open(path, errors="replace"):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            jobs[jid] = {
                "start": e["Submission Time"],
                "desc": e.get("Properties", {}).get(
                    "spark.job.description", ""),
                "stages": len(e.get("Stage IDs", [])),
                "tasks": sum(s.get("Number of Tasks", 0)
                             for s in e.get("Stage Infos", [])),
            }
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["end"] = e["Completion Time"]
        elif ev == "SparkListenerApplicationStart":
            app_start = e["Timestamp"]
        elif ev == "SparkListenerApplicationEnd":
            app_end = e["Timestamp"]

    ordered = sorted(jobs.items())
    total_job = 0
    prev_end = app_start
    gap_total = 0
    print(f"{'job':>4} {'sec':>8} {'gap_before':>10} {'stages':>6} "
          f"{'tasks':>6}  desc")
    by_desc = defaultdict(float)
    gap_by_desc = defaultdict(float)
    for jid, j in ordered:
        if "end" not in j:
            continue
        dur = (j["end"] - j["start"]) / 1000.0
        gap = (j["start"] - prev_end) / 1000.0 if prev_end else 0.0
        prev_end = j["end"]
        total_job += dur
        gap_total += max(gap, 0)
        by_desc[j["desc"]] += dur
        gap_by_desc[j["desc"]] += max(gap, 0)
        if dur >= min_sec or gap >= min_sec:
            print(f"{jid:>4} {dur:8.2f} {gap:10.2f} {j['stages']:>6} "
                  f"{j['tasks']:>6}  {j['desc'][:90]}")
    print("\n== by description (job sec / gap-before sec) ==")
    for d, s in sorted(by_desc.items(), key=lambda kv: -kv[1]):
        print(f"{s:8.2f} {gap_by_desc[d]:8.2f}  {d[:100]}")
    if app_start and app_end:
        print(f"\napp wall: {(app_end-app_start)/1000.0:.2f}s, "
              f"jobs: {total_job:.2f}s, gaps: {gap_total:.2f}s")


if __name__ == "__main__":
    main()
