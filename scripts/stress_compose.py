#!/usr/bin/env python3
"""Compose ONE de-noised stress-point artifact from a cold-posture and a
warm-posture merged run (round-12 verdict ask #2): per-query wall = MIN
across postures (a build-independent plan costs the same under either
posture, so warm-vs-cold spread beyond noise is measurement error, not
signal), with both postures' walls and their spread ratio recorded, and
the worst spreads surfaced instead of silently folded.

Usage: stress_compose.py out.json round scale cold.json warm.json
       [--prev lower_scale_composed.json] [--spread-limit 1.3]

- queries: min(cold, warm) per query; cold_sec/warm_sec/spread kept.
- spread_flags: queries whose cross-posture ratio exceeds the limit —
  candidates for build-cost attribution (builds fire inside a cold
  query's wall) or box noise; listed, never hidden.
- builds: from the COLD run (the true build cost) plus warm re-read cost
  as warm_build_sec.
- fitted_exponent_per_decade vs --prev (same composition at scale/10).
"""
import json
import math
import sys


def main():
    args = sys.argv[1:]
    prev = None
    limit = 1.3
    if "--prev" in args:
        i = args.index("--prev")
        prev = json.load(open(args[i + 1]))
        args = args[:i] + args[i + 2:]
    if "--spread-limit" in args:
        i = args.index("--spread-limit")
        limit = float(args[i + 1])
        args = args[:i] + args[i + 2:]
    out, rnd, scale, coldp, warmp = args[:5]
    cold = json.load(open(coldp))
    warm = json.load(open(warmp))
    cq, wq = cold["queries"], warm["queries"]
    if set(cq) != set(wq):
        sys.exit(f"FATAL: posture query surfaces differ: {sorted(set(cq) ^ set(wq))}")

    queries, detail, flags = {}, {}, {}
    for k in sorted(cq):
        c, w = cq[k], wq[k]
        m = min(c, w)
        queries[k] = round(m, 3)
        spread = round(max(c, w) / max(m, 1e-9), 2)
        detail[k] = {"cold": round(c, 3), "warm": round(w, 3), "spread": spread}
        # flag only where the spread is material in absolute terms too
        if spread > limit and max(c, w) - m >= 1.0:
            flags[k] = detail[k]

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
        "method": f"per-query min across cold and warm build-cache postures "
                  f"(each posture one full chunked run); spread > {limit}x "
                  f"AND >= 1s listed in spread_flags, not hidden",
        "n_queries": len(queries),
        "n_errors": len(cold.get("errors", {})) + len(warm.get("errors", {})),
        "errors": {**cold.get("errors", {}), **warm.get("errors", {})},
        "total_sec": round(sum(queries.values()) + sum(cold.get("builds", {}).values()), 1),
        "build_sec_cold": round(sum(cold.get("builds", {}).values()), 1),
        "build_sec_warm": round(sum(warm.get("builds", {}).values()), 1),
        "queries": queries,
        "posture_detail": detail,
        "spread_flags": flags,
        "builds": cold.get("builds", {}),
        "n_runs": {k: 2 for k in queries},
    }
    if exps:
        art["fitted_exponent_per_decade"] = dict(sorted(exps.items()))
        # monotonicity audit: a lower-scale wall exceeding this scale's is
        # physically impossible for one plan — list offenders
        viol = {k: {"prev": round(prev["queries"][k], 3), "this": queries[k]}
                for k in queries
                if k in prev.get("queries", {}) and prev["queries"][k] > queries[k]
                and prev["queries"][k] - queries[k] >= 1.0}
        if viol:
            art["monotonicity_violations"] = viol
    json.dump(art, open(out, "w"), indent=1)
    print(f"{out}: {len(queries)} q, total {art['total_sec']}s, "
          f"spread_flags {list(flags)}, "
          f"mono_violations {list(art.get('monotonicity_violations', {}))}")


if __name__ == "__main__":
    main()
