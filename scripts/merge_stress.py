#!/usr/bin/env python3
"""Merge per-chunk Bench subset artifacts into one stress-point JSON.

Usage: merge_stress.py <chunk_dir> <out.json> <round> <scale_desc>
       [--prev prev_point.json]

Sums per-chunk walls/builds, unions query maps and errors, and (with
--prev, an artifact of the same shape at the previous scale decade)
fits per-query log10 exponents so the artifact carries its own
scale-up story.
"""
import glob
import json
import math
import sys


def main():
    chunk_dir, out, rnd, scale = sys.argv[1:5]
    prev = None
    if "--prev" in sys.argv:
        prev = json.load(open(sys.argv[sys.argv.index("--prev") + 1]))
    queries, builds, errors, n_runs = {}, {}, {}, {}
    canaries, query_chunk = {}, {}
    for f in sorted(glob.glob(f"{chunk_dir}/*.json")):
        d = json.load(open(f))
        chunk = f.rsplit("/", 1)[-1].removesuffix(".json")
        # Duplicate query names across chunk files are an authoring error
        # (the same query measured twice would silently last-win); fail
        # loudly instead of merging a lie.
        dup = set(queries) & set(d.get("queries", {}))
        if dup:
            sys.exit(f"FATAL: query keys in multiple chunks: {sorted(dup)}")
        queries.update(d.get("queries", {}))
        # Stall canary (round-15 verdict ask #7): each chunk JVM runs a
        # fixed CPU-bound probe at start and end; carrying it per chunk —
        # plus which chunk measured each query — lets stress_compose flag
        # walls sourced only from stall-era chunks as data, not inference.
        if "canary_sec" in d:
            canaries[chunk] = d["canary_sec"]
        for q in d.get("queries", {}):
            query_chunk[q] = chunk
        # Build keys legitimately repeat across chunks (each chunk JVM
        # pays its own copy of a shared build) — SUM them, don't overwrite,
        # so build_sec/total_sec reflect wall actually spent.
        for k, v in d.get("builds", {}).items():
            builds[k] = builds.get(k, 0.0) + v
        errors.update(d.get("errors", {}))
        n_runs.update(d.get("n_runs", {}))
    exps = {}
    if prev:
        pq = prev.get("queries", {})
        for k, v in queries.items():
            old = pq.get(k)
            if old and old > 0.05 and v > 0.05:
                exps[k] = round(math.log10(v / old), 2)
    art = {
        "round": int(rnd),
        "scale": scale,
        "n_queries": len(queries),
        "n_errors": len(errors),
        "total_sec": round(sum(queries.values()) + sum(builds.values()), 1),
        "build_sec": round(sum(builds.values()), 1),
        "errors": errors,
        "queries": {k: round(v, 3) for k, v in sorted(queries.items())},
        "builds": {k: round(v, 3) for k, v in sorted(builds.items())},
        # measurement passes per query; absent = 1 (2 = Bench's zero-wall
        # re-measure fired for that query)
        "n_runs": dict(sorted(n_runs.items())),
    }
    if canaries:
        art["canaries"] = dict(sorted(canaries.items()))
        art["query_chunk"] = dict(sorted(query_chunk.items()))
    zeros = [k for k, v in art["queries"].items()
             if v == 0.0 and k not in errors]
    if zeros:
        sys.exit(f"FATAL: zero walls survived the re-measure rule: {zeros}")
    if exps:
        art["fitted_exponent_per_decade"] = dict(sorted(exps.items()))
    json.dump(art, open(out, "w"), indent=1)
    print(out, "n_queries", len(queries), "errors", len(errors),
          "total %.1f" % art["total_sec"], "build %.1f" % art["build_sec"])


if __name__ == "__main__":
    main()
