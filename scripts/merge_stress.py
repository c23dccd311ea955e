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
    queries, builds, errors = {}, {}, {}
    for f in sorted(glob.glob(f"{chunk_dir}/*.json")):
        d = json.load(open(f))
        queries.update(d.get("queries", {}))
        builds.update(d.get("builds", {}))
        errors.update(d.get("errors", {}))
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
    }
    if exps:
        art["fitted_exponent_per_decade"] = dict(sorted(exps.items()))
    json.dump(art, open(out, "w"), indent=1)
    print(out, "n_queries", len(queries), "errors", len(errors),
          "total %.1f" % art["total_sec"], "build %.1f" % art["build_sec"])


if __name__ == "__main__":
    main()
