"""Where does the wide level idle? Parse a Spark event log into a
job/stage timeline: per-job driver gaps (time when NO job is running)
and per-stage tail waste (span x cores - sum of task run times).

The flagship bench runs warm-up jobs then measured jobs; pass
--after-job J to start the analysis at job id J (use --list to see
job spans first).

Usage: python scripts/timeline_gaps.py <eventlog> <cores> [--after-job J]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    path, cores = sys.argv[1], int(sys.argv[2])
    after = None
    window = None  # (t0_ms, t1_ms) precise measured region
    if "--after-job" in sys.argv:
        after = int(sys.argv[sys.argv.index("--after-job") + 1])
    if "--window" in sys.argv:
        i = sys.argv.index("--window")
        window = (int(sys.argv[i + 1]), int(sys.argv[i + 2]))
    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    stage_job: dict[int, int] = {}
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            t = ev.get("Event")
            if t == "SparkListenerJobStart":
                jid = ev["Job ID"]
                jobs[jid] = {"start": ev["Submission Time"], "end": None}
                for sid in ev.get("Stage IDs", []):
                    stage_job[sid] = jid
            elif t == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev["Completion Time"]
            elif t == "SparkListenerStageCompleted":
                info = ev["Stage Info"]
                sid = info["Stage ID"]
                st = stages.setdefault(sid, {"task_run_ms": 0, "tasks": 0})
                st["submit"] = info.get("Submission Time")
                st["complete"] = info.get("Completion Time")
                st["name"] = info.get("Stage Name", "")[:48]
                st["n_tasks"] = info.get("Number of Tasks", 0)
            elif t == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                ti = ev.get("Task Info", {})
                st = stages.setdefault(sid, {"task_run_ms": 0, "tasks": 0})
                st["task_run_ms"] += ti.get("Finish Time", 0) - ti.get(
                    "Launch Time", 0)
                st["tasks"] += 1

    ordered = sorted((j, v) for j, v in jobs.items() if v["end"])
    if "--list" in sys.argv:
        for j, v in ordered:
            print(f"job {j:>3}  span={(v['end'] - v['start']) / 1e3:8.2f}s")
        return 0
    if after is not None:
        ordered = [(j, v) for j, v in ordered if j >= after]
    if window is not None:
        ordered = [(j, v) for j, v in ordered if v["start"] >= window[0]]

    t0 = min(v["start"] for _, v in ordered)
    t1 = max(v["end"] for _, v in ordered)
    if window is not None:
        t0, t1 = window  # charge driver time before the first job too
    wall = (t1 - t0) / 1e3
    # driver gaps: time not covered by any job interval
    covered = 0
    cur = t0
    for _, v in sorted(ordered, key=lambda x: x[1]["start"]):
        s, e = max(v["start"], cur), v["end"]
        if e > cur:
            covered += e - max(s, cur) if s >= cur else e - cur
            cur = max(cur, e)
    gap_s = (t1 - t0 - covered) / 1e3
    print(f"measured wall={wall:.2f}s  cores={cores}  "
          f"budget={wall * cores:.0f} core-s  driver-gap={gap_s:.2f}s "
          f"({gap_s * cores:.0f} core-s)")

    # per-stage: span vs task busy integral
    rows = []
    for sid, st in stages.items():
        if st.get("submit") is None or stage_job.get(sid, -1) not in dict(
                ordered):
            continue
        span = (st["complete"] - st["submit"]) / 1e3
        busy = st["task_run_ms"] / 1e3
        waste = span * cores - busy  # core-s the stage left idle IF it
        # had the machine to itself (overlapping stages overstate this;
        # treat as upper bound, compare levels)
        rows.append((waste, span, busy, sid, st["name"], st["n_tasks"]))
    rows.sort(reverse=True)
    tot_busy = sum(r[2] for r in rows)
    print(f"sum task-busy={tot_busy:.0f} core-s  "
          f"scheduler idle ~= {wall * cores - tot_busy - gap_s * cores:.0f}"
          f" core-s (excl driver gaps)")
    print(f"{'stage':>6} {'span_s':>8} {'busy_cs':>8} {'idle_cs*':>8} "
          f"{'tasks':>5}  name")
    for waste, span, busy, sid, name, nt in rows[:15]:
        print(f"{sid:>6} {span:>8.2f} {busy:>8.1f} {waste:>8.1f} {nt:>5}  "
              f"{name}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
