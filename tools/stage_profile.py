#!/usr/bin/env python3
"""Aggregate a Spark event log into per-stage wall and executor time.

Usage: python3 tools/stage_profile.py <eventlog-file> [top_n]

For each stage: name (callsite), wall = completion - submission, task time =
sum of executor run time over tasks, plus GC, deserialization, and shuffle
read/write bytes. Sorted by task time. The tool exists to answer "where does
a probe query's wall clock actually go" without the Spark UI (disabled in
the bench harness) — see BENCH_notes_r12 §2.
"""
import json
import sys
from collections import defaultdict


def main():
    path = sys.argv[1]
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 25
    stages = {}
    tasks = defaultdict(lambda: defaultdict(float))
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            sid = si["Stage ID"]
            stages[sid] = {
                "name": si.get("Stage Name", "?"),
                "ntasks": si.get("Number of Tasks", 0),
                "wall_s": (si.get("Completion Time", 0) -
                           si.get("Submission Time", 0)) / 1e3,
            }
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            tm = e.get("Task Metrics") or {}
            t = tasks[sid]
            t["run_s"] += tm.get("Executor Run Time", 0) / 1e3
            t["gc_s"] += tm.get("JVM GC Time", 0) / 1e3
            t["deser_s"] += tm.get("Executor Deserialize Time", 0) / 1e3
            t["result_ser_s"] += tm.get("Result Serialization Time", 0) / 1e3
            srm = tm.get("Shuffle Read Metrics") or {}
            t["sh_read_mb"] += (srm.get("Local Bytes Read", 0) +
                                srm.get("Remote Bytes Read", 0)) / 1e6
            t["fetch_wait_s"] += srm.get("Fetch Wait Time", 0) / 1e3
            swm = tm.get("Shuffle Write Metrics") or {}
            t["sh_write_mb"] += swm.get("Shuffle Bytes Written", 0) / 1e6
            t["sh_write_s"] += swm.get("Shuffle Write Time", 0) / 1e9

    rows = []
    for sid, s in stages.items():
        t = tasks.get(sid, {})
        rows.append((t.get("run_s", 0.0), sid, s, t))
    rows.sort(reverse=True)
    total_run = sum(r[0] for r in rows)
    total_wall = sum(r[2]["wall_s"] for r in rows)
    print(f"{len(rows)} stages; sum task run {total_run:.1f}s; "
          f"sum stage wall {total_wall:.1f}s")
    print(f"{'stage':>5} {'run_s':>8} {'wall_s':>7} {'gc_s':>6} {'tasks':>5} "
          f"{'shR_MB':>8} {'shW_MB':>8}  name")
    for run_s, sid, s, t in rows[:top_n]:
        name = s["name"].split("\n")[0][:90]
        print(f"{sid:>5} {run_s:>8.1f} {s['wall_s']:>7.1f} "
              f"{t.get('gc_s', 0):>6.1f} {s['ntasks']:>5} "
              f"{t.get('sh_read_mb', 0):>8.0f} {t.get('sh_write_mb', 0):>8.0f}"
              f"  {name}")


if __name__ == "__main__":
    main()
