#!/usr/bin/env python3
"""Merge N Bench artifacts of the SAME query surface into one
per-query-min artifact (the box-noise methodology: repeated or
cross-posture runs, commit the min with n_runs recorded).

Usage: min_merge_bench.py out.json method_desc in1.json in2.json ...
       [--prev a.json,b.json] [--posture NAME]

- queries/builds: per-key min across inputs (a query must appear in every
  input — fail loudly otherwise; builds may legitimately differ).
- n_runs: number of inputs, recorded per query.
- regressions: per-query delta vs the per-key MIN across --prev artifacts
  (same rule as Bench: flagged when new - old >= 1.0s and max >= 0.25s).
- value: sum of merged query walls + merged build walls.
- per_run: each input's (file, total, posture) for provenance.
"""
import json
import sys


def main():
    args = sys.argv[1:]
    prev_paths = []
    posture = None
    if "--prev" in args:
        i = args.index("--prev")
        prev_paths = args[i + 1].split(",")
        args = args[:i] + args[i + 2:]
    if "--posture" in args:
        i = args.index("--posture")
        posture = args[i + 1]
        args = args[:i] + args[i + 2:]
    out, method = args[0], args[1]
    ins = [(p, json.load(open(p))) for p in args[2:]]
    assert len(ins) >= 1

    keysets = [set(d["queries"]) for _, d in ins]
    common = set.intersection(*keysets)
    union = set.union(*keysets)
    if common != union:
        sys.exit(f"FATAL: query surfaces differ across inputs: {sorted(union - common)}")

    queries = {k: min(d["queries"][k] for _, d in ins) for k in sorted(common)}
    builds = {}
    for _, d in ins:
        for k, v in d.get("builds", {}).items():
            builds[k] = min(v, builds.get(k, 1e18))
    errors = {}
    for _, d in ins:
        errors.update(d.get("errors", {}))

    prev = {}
    for p in prev_paths:
        try:
            d = json.load(open(p))
            for k, v in d.get("queries", {}).items():
                prev[k] = min(v, prev.get(k, 1e18))
        except Exception:
            pass
    regressions = {
        k: {"old": round(prev[k], 4), "new": round(v, 4)}
        for k, v in queries.items()
        if k in prev and v - prev[k] >= 1.0 and max(v, prev[k]) >= 0.25
    }

    postures = sorted({d.get("build_cache", "?") for _, d in ins})
    art = {
        "metric": "total",
        "value": round(sum(queries.values()) + sum(builds.values()), 4),
        "unit": "sec",
        "method": method,
        "n_runs": len(ins),
        "build_cache": posture or (postures[0] if len(postures) == 1 else "min-of:" + "+".join(postures)),
        "sf": ins[0][1].get("sf"),
        "queries": {k: round(v, 4) for k, v in queries.items()},
        "builds": {k: round(v, 4) for k, v in builds.items()},
        "errors": errors,
        "regressions": regressions,
        "per_run": [
            {"file": p, "total": d.get("value"), "build_cache": d.get("build_cache")}
            for p, d in ins
        ],
    }
    json.dump(art, open(out, "w"), indent=1)
    print(f"{out}: {len(queries)} queries, total {art['value']}s, "
          f"regressions {list(regressions)}, n_runs {len(ins)}")


if __name__ == "__main__":
    main()
