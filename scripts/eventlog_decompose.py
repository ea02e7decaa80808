#!/usr/bin/env python
"""Decompose a flagship bench run's wall-clock from the Spark event log.

Separates EXECUTOR-side time (sum of task wall per stage — the part that
scales with cores) from DRIVER-side gaps (planning/analysis/Python between
jobs — the non-scaling constant C in  eff = (W + C) / (W + 4C)).

Usage: python scripts/eventlog_decompose.py /tmp/sparkevents/eventlog_v2_local-*/
Reads the rolling-v2 event file(s), prints per-job wall/task-time and the
inter-job driver gaps ranked by size.
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load_events(path: str):
    files = sorted(glob.glob(os.path.join(path, "events_*"))) or [path]
    for f in files:
        with open(f) as fh:
            for line in fh:
                try:
                    yield json.loads(line)
                except json.JSONDecodeError:
                    continue


def main() -> None:
    path = sys.argv[1]
    jobs: dict[int, dict] = {}
    stage_task_ms: dict[int, float] = {}
    stage_job: dict[int, int] = {}
    app_start = app_end = None
    for ev in load_events(path):
        e = ev.get("Event")
        if e == "SparkListenerApplicationStart":
            app_start = ev["Timestamp"]
        elif e == "SparkListenerApplicationEnd":
            app_end = ev["Timestamp"]
        elif e == "SparkListenerJobStart":
            jid = ev["Job ID"]
            jobs[jid] = {
                "start": ev["Submission Time"],
                "stages": [s["Stage ID"] for s in ev["Stage Infos"]],
                "desc": (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )[:60],
            }
            for s in ev["Stage Infos"]:
                stage_job[s["Stage ID"]] = jid
        elif e == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
        elif e == "SparkListenerTaskEnd":
            sid = ev["Stage ID"]
            ti = ev.get("Task Info", {})
            dur = ti.get("Finish Time", 0) - ti.get("Launch Time", 0)
            stage_task_ms[sid] = stage_task_ms.get(sid, 0.0) + max(dur, 0)

    order = sorted(jobs)
    total_job_wall = 0.0
    total_task = 0.0
    print(f"{'job':>4} {'wall_s':>8} {'task_s':>9} {'gap_before_s':>12}  desc")
    prev_end = app_start
    gaps = []
    for jid in order:
        j = jobs[jid]
        if "end" not in j:
            continue
        wall = (j["end"] - j["start"]) / 1e3
        task = sum(stage_task_ms.get(s, 0.0) for s in j["stages"]) / 1e3
        gap = (j["start"] - prev_end) / 1e3 if prev_end else 0.0
        gaps.append((gap, jid, j["desc"]))
        total_job_wall += wall
        total_task += task
        if wall > 1.0 or gap > 1.0:
            print(f"{jid:>4} {wall:8.1f} {task:9.1f} {gap:12.1f}  {j['desc']}")
        prev_end = j["end"]
    app_wall = (app_end - app_start) / 1e3 if app_start and app_end else None
    drv = sum(g for g, _, _ in gaps if g > 0)
    print(f"\napp wall: {app_wall and round(app_wall, 1)}s  "
          f"sum job wall: {total_job_wall:.1f}s  "
          f"sum task time: {total_task:.1f}s  "
          f"driver gaps (non-scaling C candidate): {drv:.1f}s")
    print("\ntop driver gaps:")
    for g, jid, desc in sorted(gaps, reverse=True)[:12]:
        print(f"  {g:8.1f}s before job {jid}  {desc}")


if __name__ == "__main__":
    main()
