#!/usr/bin/env python3
"""Attribute shuffle traffic to SQL plan nodes from a Spark event log.

Usage: python3 tools/sql_profile.py <eventlog-file> [min_mb]

stage_profile.py answers "which STAGE costs what" but AQE stage names are
all `withThreadLocalCaptured`, so a pipeline with a dozen similar-sized
exchanges (the x57 decomposition problem, REVIEW_r13 §7) cannot be
attributed from stages alone. This tool walks every SQLExecution's plan
tree (the LAST AdaptiveExecutionUpdate per execution wins — that is the
final AQE plan), sums each metric accumulator from TaskEnd accumulable
updates plus DriverAccumUpdates, and prints every Exchange / window /
aggregate node whose shuffle-bytes-written (or data size) exceeds the
threshold, with the node's simpleString — which names the partition
keys and output columns, i.e. exactly the "which operator ships the
payload" answer the stage view cannot give.
"""
import json
import sys
from collections import defaultdict


def walk(node, out, depth=0):
    out.append((depth, node))
    for c in node.get("children", []):
        walk(c, out, depth + 1)


def main():
    path = sys.argv[1]
    min_mb = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0
    plans = {}          # executionId -> latest sparkPlanInfo
    desc = {}           # executionId -> first physicalPlanDescription lines
    acc = defaultdict(int)  # accumulator id -> summed updates
    for line in open(path):
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event", "")
        if ev.endswith("SparkListenerSQLExecutionStart"):
            plans[e["executionId"]] = e["sparkPlanInfo"]
            desc[e["executionId"]] = e.get("description", "")
        elif ev.endswith("SparkListenerSQLAdaptiveExecutionUpdate"):
            plans[e["executionId"]] = e["sparkPlanInfo"]
        elif ev == "SparkListenerTaskEnd":
            for a in (e.get("Task Info") or {}).get("Accumulables", []):
                u = a.get("Update")
                if isinstance(u, (int, float)):
                    acc[a["ID"]] += int(u)
                elif isinstance(u, str) and u.lstrip("-").isdigit():
                    acc[a["ID"]] += int(u)
        elif ev.endswith("SparkListenerDriverAccumUpdates"):
            for aid, v in e.get("accumUpdates", []):
                acc[aid] += int(v)

    # A node can appear in many executions' plan trees (cached subplans,
    # AQE re-broadcasts) with the SAME accumulators — dedupe on the plan_id
    # in simpleString (fallback: the metric accumulator ids) so each
    # physical exchange prints once with its cumulative bytes.
    rows = []
    seen = set()
    for eid, plan in sorted(plans.items()):
        nodes = []
        walk(plan, nodes)
        for depth, n in nodes:
            name = n.get("nodeName", "")
            if not any(k in name for k in (
                    "Exchange", "Window", "Sort", "Aggregate", "Join",
                    "BroadcastExchange")):
                continue
            mets = {}
            for m in n.get("metrics", []):
                v = acc.get(m["accumulatorId"])
                if v:
                    mets[m["name"]] = v
            written = mets.get("shuffle bytes written", 0)
            data = mets.get("data size", 0)
            rough = max(written, data)
            ss = n.get("simpleString", "")
            key = ss[ss.find("plan_id"):] or tuple(
                sorted(m["accumulatorId"] for m in n.get("metrics", [])))
            if rough >= min_mb * 1024 * 1024 and key not in seen:
                seen.add(key)
                rows.append((rough, eid, name, written, data, ss[:220]))
    rows.sort(reverse=True)
    print(f"{'MB':>8} {'eid':>4}  node  [shuffleWritten/dataSize]  simpleString")
    for rough, eid, name, written, data, ss in rows:
        print(f"{rough/1048576:8.1f} {eid:4d}  {name}  "
              f"[{written/1048576:.1f}/{data/1048576:.1f}]  {ss}")


if __name__ == "__main__":
    main()
