#!/usr/bin/env python3
"""Assemble the round INC_MAINT artifact from per-scale IncMaintBench
outputs (each one JSON line written via GRAFT_INC_OUT).

Usage: merge_inc_maint.py out.json round label1=path1 [label2=path2 ...]

The summary is recomputed from the actual points so it can never drift
from the data it claims to summarize.
"""
import json
import sys


def main():
    out, rnd = sys.argv[1], int(sys.argv[2])
    scales = {}
    for spec in sys.argv[3:]:
        label, path = spec.split("=", 1)
        scales[label] = json.load(open(path))
    lines = []
    for label, s in scales.items():
        pts = s.get("points", [])
        # An empty/truncated GRAFT_INC_OUT must not be merged as
        # "certified": a scale with no points has no hash certs at all,
        # so the vacuous all-green would be a lie (round-16 advice).
        if not pts:
            sys.exit(f"FATAL: {label} has no points — nothing certified")
        for p in pts:
            if not (p.get("matches_replay") and p.get("scd2_matches_replay")):
                sys.exit(f"FATAL: {label} frac={p.get('frac')} hash cert failed")
        if pts:
            lines.append(
                f"{label}: replay {s['full_replay_sec']:.1f}s / scd2 "
                f"{s['scd2_full_replay_sec']:.1f}s; merge "
                + ", ".join(
                    f"{p['inc_merge_sec']:.1f}s@{p['frac']:.0%} "
                    f"({p['speedup_vs_replay']:.0f}x) / scd2 "
                    f"{p['scd2_inc_merge_sec']:.1f}s "
                    f"({p['scd2_speedup_vs_replay']:.0f}x)"
                    for p in pts))
    art = {
        "metric": "inc_maintenance",
        "round": rnd,
        "contract": "merge(state(feed<=L), delta(L,hi]) == replay(feed<=hi) "
                    "for the LWW snapshot (row 209) AND closed(<=L) u "
                    "close(open,delta) u versions(delta) == scd2(<=hi) "
                    "(row 210); certified per point by multiset-additive "
                    "decimal row hash (matches_replay / scd2_matches_replay)",
        "method": "checkpoint artifacts (state / closed+cursor) and delta "
                  "each materialized to parquet; incremental paths read "
                  "ONLY those (no feed scan); re-priced this round on the "
                  "POST-FUSION scd2 merge plan (the r14 pricing measured "
                  "the pre-fusion plan); single warm run per scale",
        "summary": " | ".join(lines),
        "scales": scales,
    }
    json.dump(art, open(out, "w"), indent=1)
    print(out, "scales", list(scales), "all hash certs green")


if __name__ == "__main__":
    main()
