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

    # Stall-canary attribution (round-15 verdict ask #7): each chunk JVM
    # recorded a fixed CPU-bound probe wall at start and end; a chunk whose
    # canary (min of its two observations) exceeds 2x the run set's global
    # minimum was measured during a host stall. A stall only ever INFLATES
    # a wall, so a composed min sourced from one stalled posture is still a
    # valid upper bound — but a query whose walls in BOTH postures come
    # from stalled chunks has no clean measurement at all and is listed in
    # stall_flagged: its composed wall is a stall-era ceiling, not a plan
    # cost, and must not become an inherited floor.
    # Two probes, each ratioed against ITS OWN global min (round-16
    # advice): the CPU probe alone misses the era class actually observed
    # on this host — raw CPU quiet while exchange-heavy walls sat at 2-3x
    # (VM host bandwidth contention). Bench records a 50M-row shuffle
    # probe precisely for that; folding it into the stall rule (a chunk
    # is stalled if EITHER probe exceeds 2x its own floor) closes the
    # blind spot where a bandwidth era produced stall_flagged=[].
    def chunk_canary(art, a, b):
        return {ch: min(v[a], v[b])
                for ch, v in art.get("canaries", {}).items()
                if a in v and b in v}
    ccan = chunk_canary(cold, "start", "end")
    wcan = chunk_canary(warm, "start", "end")
    cshuf = chunk_canary(cold, "start_shuffle", "end_shuffle")
    wshuf = chunk_canary(warm, "start_shuffle", "end_shuffle")
    all_can = list(ccan.values()) + list(wcan.values())
    can_min = min(all_can) if all_can else None
    all_shuf = list(cshuf.values()) + list(wshuf.values())
    shuf_min = min(all_shuf) if all_shuf else None
    cchunk = cold.get("query_chunk", {})
    wchunk = warm.get("query_chunk", {})

    def ratio(canmap, chunkmap, k, floor):
        ch = chunkmap.get(k)
        if floor and ch in canmap:
            return round(canmap[ch] / floor, 2)
        return None

    queries, detail, flags, stall_flags = {}, {}, {}, {}
    for k in sorted(cq):
        c, w = cq[k], wq[k]
        m = min(c, w)
        queries[k] = round(m, 3)
        spread = round(max(c, w) / max(m, 1e-9), 2)
        detail[k] = {"cold": round(c, 3), "warm": round(w, 3), "spread": spread}
        rc = ratio(ccan, cchunk, k, can_min)
        rw = ratio(wcan, wchunk, k, can_min)
        sc = ratio(cshuf, cchunk, k, shuf_min)
        sw = ratio(wshuf, wchunk, k, shuf_min)
        if rc is not None:
            detail[k]["canary_cold"] = rc
        if rw is not None:
            detail[k]["canary_warm"] = rw
        if sc is not None:
            detail[k]["canary_shuffle_cold"] = sc
        if sw is not None:
            detail[k]["canary_shuffle_warm"] = sw
        # per-posture stalled = EITHER probe > 2x its own floor; a query
        # is stall_flagged only when BOTH postures were stalled (a stall
        # only inflates, so one clean posture still bounds the plan cost)
        cold_stalled = (rc is not None and rc > 2.0) or \
                       (sc is not None and sc > 2.0)
        warm_stalled = (rw is not None and rw > 2.0) or \
                       (sw is not None and sw > 2.0)
        if (rc is not None or sc is not None) and \
           (rw is not None or sw is not None) and \
           cold_stalled and warm_stalled:
            stall_flags[k] = detail[k]
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
    if can_min is not None:
        art["canary"] = {
            "global_min_sec": round(can_min, 3),
            "stall_rule": "chunk stalled if min(start,end) of EITHER the "
                          "cpu probe or the shuffle probe > 2x that "
                          "probe's own global min; query stall_flagged "
                          "if BOTH postures stalled",
            "cold_chunks": {ch: round(v, 3) for ch, v in sorted(ccan.items())},
            "warm_chunks": {ch: round(v, 3) for ch, v in sorted(wcan.items())},
        }
        if shuf_min is not None:
            art["canary"]["shuffle_global_min_sec"] = round(shuf_min, 3)
            art["canary"]["shuffle_cold_chunks"] = {
                ch: round(v, 3) for ch, v in sorted(cshuf.items())}
            art["canary"]["shuffle_warm_chunks"] = {
                ch: round(v, 3) for ch, v in sorted(wshuf.items())}
        art["stall_flagged"] = stall_flags
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
          f"spread_flags {list(flags)}, stall_flagged {list(stall_flags)}, "
          f"mono_violations {list(art.get('monotonicity_violations', {}))}")


if __name__ == "__main__":
    main()
