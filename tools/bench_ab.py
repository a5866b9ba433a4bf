#!/usr/bin/env python3
"""Same-session interleaved A/B bench: prior git rev vs working tree.

Round 10's committed canonical and the driver's same-code end-of-round run
disagreed by 46 s (140.6 vs 186.8 s, same boot, uptime-correlated floor
drift) — a bench record taken at ONE point in time encodes the floor it ran
on, so round-over-round deltas conflate code with environment. The method
that adjudicated every round-10 dispute (dom rewrite, x42, x78) was a
same-session A/B: build the prior rev in a worktree, interleave full passes
of both sides so floor drift hits them symmetrically, and compare per-query
minima. This tool makes that the recorded artifact instead of a hand
procedure:

  python3 tools/bench_ab.py                         # prior = last round's verdict commit
  python3 tools/bench_ab.py --prior <rev> --out docs/BENCH_delta_r11.json
  python3 tools/bench_ab.py --passes 2 --reps 2 --only x19,x42

Protocol:
  * prior rev checked out into a git worktree under .ab/ (inside the repo,
    ignored), compiled once with its own sbt target;
  * interleaved pass order A B B A (A = current tree) — each side gets one
    early and one late pass, so a monotone floor drift cancels in the
    per-side minima;
  * per side, per query: steady = min warm rep over all passes, cold = min
    first-rep; every pass is a probe run (SPARK_GRAFT_BENCH_OUT), so the
    committed canonical BENCH_line.json is never rewritten by this tool;
  * delta math: floors are computed PER ROUND TRIP (each adjacent A+B pass
    pair gets floor_t = median current/prior steady over that trip's
    queries with prior steady >= min-steady) and each query's per-trip raw
    ratio is normalized by ITS trip's floor; the reported norm is the
    median over trips. Round 11's final delta hit a 1.127 floor in one
    pass (one side +30 % for ~minutes) that a single global floor only
    partially absorbed — per-trip floors cancel a drift that lands inside
    one round trip instead of smearing it across all queries. The global
    floor (bench_delta.py's method: minima combined across passes first)
    is still recorded as norm_global for continuity; flags use the
    per-trip norm.

The artifact records both sides' per-query steadies, per-trip floors and
norms, flags, boot fingerprint and uptimes per pass — enough to re-derive
every number without rerunning.

Drift handling (round 13): after the planned trips, the TRIP-FLOOR SPREAD
(max/min - 1 over trip floors) is checked against --drift (default 10%).
Above it, round trips are appended automatically up to --max-passes so the
per-query trip-norm median has >= 3 points of support; if the spread still
exceeds the bound at the cap, the artifact's `total_level` field WITHHOLDS
the total-level summary and directs the reader to the per-query trip norms
(round 12's two-trip delta under a +42% one-side floor spike produced two
contradictory total-level numbers — raw -17% vs normalized +17% — and had
to be hand-adjudicated; this makes the artifact self-adjudicating).
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = "/root/repo"


def sh(cmd, cwd=REPO, env=None, check=True):
    e = dict(os.environ)
    if env:
        e.update(env)
    return subprocess.run(cmd, cwd=cwd, env=e, check=check,
                          capture_output=True, text=True)


def default_prior():
    out = sh(["git", "log", "--grep", "^round [0-9]*: verdict", "-1",
              "--format=%H"]).stdout.strip()
    if not out:
        raise SystemExit("no 'round N: verdict' commit found; pass --prior")
    return out


def ensure_worktree(rev):
    short = sh(["git", "rev-parse", "--short", rev]).stdout.strip()
    path = os.path.join(REPO, ".ab", short)
    if not os.path.isdir(path):
        os.makedirs(os.path.join(REPO, ".ab"), exist_ok=True)
        sh(["git", "worktree", "add", "--detach", path, rev])
    return path


def compile_tree(path):
    print(f"[ab] compiling {path} ...", flush=True)
    t0 = time.time()
    r = sh(["sbt", "-batch", "compile"], cwd=path, check=False)
    if r.returncode != 0:
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise SystemExit(f"sbt compile failed in {path}")
    print(f"[ab] compiled in {time.time() - t0:.0f}s", flush=True)


def run_pass(tree, label, idx, sf_dir, reps, only, cpus):
    out = os.path.join(REPO, ".ab", f"pass_{label}_{idx}.json")
    if os.path.exists(out):
        os.remove(out)
    env = {"SPARK_GRAFT_BENCH_OUT": out,
           "SPARK_GRAFT_SF_DIR": sf_dir,
           "SPARK_GRAFT_BENCH_REPS": str(reps),
           # interleaved passes warm each other; the canonical-protocol
           # discarded suite pass would double every pass's wall here
           "SPARK_GRAFT_BENCH_WARMUP": "none",
           "SPARK_GRAFT_CPUS": str(cpus)}
    if only:
        env["SPARK_GRAFT_BENCH_ONLY"] = only
    print(f"[ab] pass {idx} side {label} ({tree}) ...", flush=True)
    t0 = time.time()
    r = sh(["sbt", "-batch", "runMain graft.Bench"], cwd=tree, env=env,
           check=False)
    if r.returncode != 0 or not os.path.exists(out):
        sys.stderr.write(r.stdout[-4000:] + r.stderr[-4000:])
        raise SystemExit(f"bench pass failed (side {label}, pass {idx})")
    with open(out) as f:
        rec = json.load(f)
    print(f"[ab] pass {idx} side {label}: total_steady="
          f"{rec.get('value', 0):.1f}s wall={time.time() - t0:.0f}s",
          flush=True)
    return rec


def combine(recs):
    """Per query: cold = min of first reps, steady = min warm rep across
    passes (failed-rep sentinels < 0 excluded)."""
    queries = {}
    for rec in recs:
        for q, v in rec.get("queries", {}).items():
            reps = [x for x in v.get("reps", []) if x >= 0]
            if not reps:
                continue
            slot = queries.setdefault(q, {"colds": [], "warms": []})
            slot["colds"].append(reps[0])
            slot["warms"].extend(reps[1:] or reps[:1])
    return {q: {"cold": min(s["colds"]), "steady": min(s["warms"])}
            for q, s in queries.items()}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--prior", default=None, help="git rev of the A/B prior "
                    "(default: last 'round N: verdict' commit)")
    ap.add_argument("--out", default=None,
                    help="artifact path (default docs/BENCH_delta_ab.json)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--passes", type=int, default=2,
                    help="interleaved passes PER SIDE (default 2: A B B A)")
    ap.add_argument("--reps", type=int, default=2,
                    help="reps per query per pass (default 2)")
    ap.add_argument("--only", default=None,
                    help="comma-separated query filter for a targeted A/B")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--min-steady", type=float, default=0.15)
    ap.add_argument("--drift", type=float, default=0.10,
                    help="trip-floor spread (max/min - 1) above which the "
                    "session is drifting: more round trips are added "
                    "automatically up to --max-passes, and if the spread "
                    "still exceeds this the total-level summary is "
                    "WITHHELD in the artifact (round 12's two-trip delta "
                    "under a +42%% one-side floor spike produced two "
                    "contradictory total-level numbers; per-query trip "
                    "norms were the only defensible statement)")
    ap.add_argument("--max-passes", type=int, default=None,
                    help="cap for drift-triggered auto-extension "
                    "(default max(passes, 4))")
    args = ap.parse_args()
    max_passes = args.max_passes or max(args.passes, 4)
    if not os.path.isabs(args.sf_dir):
        # the prior worktree resolves a relative fixture against ITS cwd:
        # every B-side query fails with -1 sentinels (round-13 incident)
        raise SystemExit(f"--sf-dir must be absolute, got {args.sf_dir}")

    prior_rev = args.prior or default_prior()
    prior_tree = ensure_worktree(prior_rev)
    cur_rev = sh(["git", "rev-parse", "HEAD"]).stdout.strip()
    dirty = bool(sh(["git", "status", "--porcelain", "--",
                     "src", "build.sbt"]).stdout.strip())

    compile_tree(prior_tree)
    compile_tree(REPO)

    # A B B A: each side sees the floor early and late once per round trip.
    # Round trips run one at a time; after the planned --passes trips, the
    # TRIP-FLOOR SPREAD decides whether the session is drift-polluted —
    # if so, more round trips are appended (up to --max-passes) so the
    # per-query trip-norm median has support instead of two contradictory
    # points (the round-12 failure mode).
    passes = {"A": [], "B": []}
    boots = []

    def run_trip(t):
        pair = [("A", REPO), ("B", prior_tree)]
        if t % 2 == 1:
            pair.reverse()
        for j, (label, tree) in enumerate(pair):
            i = 2 * t + j
            rec = run_pass(tree, label, i, args.sf_dir, args.reps,
                           args.only, args.cpus)
            boots.append({"pass": i, "side": label,
                          "boot_id": rec.get("boot_id"),
                          "uptime_s": rec.get("uptime_s"),
                          "total_steady": rec.get("value")})
            passes[label].append(rec)

    def trip_stats():
        n_trips = min(len(passes["A"]), len(passes["B"]))
        floors, norms = [], {}
        for t in range(n_trips):
            tc = combine([passes["A"][t]])
            tp = combine([passes["B"][t]])
            tr = {q: tc[q]["steady"] / tp[q]["steady"]
                  for q in set(tc) & set(tp) if tp[q]["steady"] > 0}
            pool = [r for q, r in tr.items()
                    if tp[q]["steady"] >= args.min_steady]
            tf = statistics.median(pool) if pool else 1.0
            floors.append(round(tf, 4))
            for q, r in tr.items():
                norms.setdefault(q, []).append(r / tf)
        return floors, norms

    def floor_spread(floors):
        return max(floors) / min(floors) - 1 if len(floors) >= 2 else 0.0

    n_trips = 0
    auto_extended = 0
    while True:
        run_trip(n_trips)
        n_trips += 1
        if n_trips < args.passes:
            continue
        tf, _ = trip_stats()
        spread = floor_spread(tf)
        if spread <= args.drift or n_trips >= max_passes:
            break
        auto_extended += 1
        print(f"[ab] trip-floor spread {spread:.1%} > {args.drift:.0%} "
              f"after {n_trips} trips — floor is drifting; adding a round "
              f"trip ({n_trips + 1}/{max_passes})", flush=True)

    cur = combine(passes["A"])
    pri = combine(passes["B"])
    common = sorted(set(cur) & set(pri))
    ratios = {q: cur[q]["steady"] / pri[q]["steady"] for q in common
              if pri[q]["steady"] > 0}
    floor_pool = [r for q, r in ratios.items()
                  if pri[q]["steady"] >= args.min_steady]
    floor = statistics.median(floor_pool) if floor_pool else 1.0

    # Per-round-trip floors: trip t = t-th A pass + t-th B pass (adjacent
    # in the A B B A order). A floor spike confined to one trip normalizes
    # away inside that trip instead of biasing every query's global ratio.
    trip_floors, trip_norms = trip_stats()
    drift_spread = floor_spread(trip_floors)

    table = {}
    flagged = []
    for q in common:
        raw = ratios.get(q)
        norm_global = raw / floor if raw else None
        tn = trip_norms.get(q)
        norm = statistics.median(tn) if tn else norm_global
        table[q] = {"prior": round(pri[q]["steady"], 4),
                    "current": round(cur[q]["steady"], 4),
                    "raw": round(raw, 4) if raw else None,
                    "norm": round(norm, 4) if norm else None,
                    "norm_global": round(norm_global, 4) if norm_global else None,
                    "trip_norms": [round(x, 4) for x in tn] if tn else None}
        if (norm and pri[q]["steady"] >= args.min_steady and
                (norm > args.threshold or norm < 1 / args.threshold)):
            flagged.append(q)
    flagged.sort(key=lambda q: -abs(table[q]["current"] - table[q]["prior"]))

    pt = sum(pri[q]["steady"] for q in common)
    ct = sum(cur[q]["steady"] for q in common)
    # Total-level verdict: a drifting floor makes BOTH total-level
    # normalizations artifacts (round 12 measured raw -17% vs per-trip
    # +17% under one +42% trip); per-query trip norms stay defensible
    # because each query normalizes inside its own trip.
    if drift_spread <= args.drift:
        total_verdict = "valid"
    else:
        total_verdict = (
            f"WITHHELD: trip-floor spread {drift_spread:.1%} > "
            f"{args.drift:.0%} after {n_trips} trips — the session floor "
            "drifted; judge per-query trip norms (queries[*].norm), not "
            "the common totals")
    artifact = {
        "method": "interleaved same-session A/B (A=working tree, B=prior "
                  "worktree), order A B B A per round trip; per side per "
                  "query: steady=min warm rep across passes; floors are "
                  "per round trip (median current/prior steady within the "
                  "trip over prior>=min_steady); norm=median over trips of "
                  "per-trip raw/floor_t; norm_global keeps the combined-"
                  "minima single-floor method for continuity",
        "prior_rev": prior_rev,
        "current_rev": cur_rev + ("+dirty" if dirty else ""),
        "sf": args.sf_dir,
        "passes_per_side": args.passes,
        "reps_per_pass": args.reps,
        "only": args.only,
        "boot": boots,
        "floor": round(floor, 4),
        "floor_pool_n": len(floor_pool),
        "trip_floors": trip_floors,
        "trip_floor_spread": round(drift_spread, 4),
        "drift_threshold": args.drift,
        "auto_extended_trips": auto_extended,
        "total_level": total_verdict,
        "threshold": args.threshold,
        "min_steady": args.min_steady,
        "common_total_prior_s": round(pt, 2),
        "common_total_current_s": round(ct, 2),
        "added": sorted(set(cur) - set(pri)),
        "removed": sorted(set(pri) - set(cur)),
        "flagged": flagged,
        "queries": table,
    }
    out = args.out or os.path.join(REPO, "docs", "BENCH_delta_ab.json")
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
    print(f"[ab] floor={floor:.3f} trips={n_trips} "
          f"spread={drift_spread:.1%} common {pt:.1f}s -> {ct:.1f}s; "
          f"{len(flagged)} flagged: {', '.join(flagged[:12])}")
    if total_verdict != "valid":
        print(f"[ab] {total_verdict}")
    print(f"[ab] wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
