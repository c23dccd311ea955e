#!/usr/bin/env python3
"""Per-query diff of two Bench artifacts (BENCH_full_*.json shape).

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [min_sec]

Prints totals, the largest per-query regressions and wins (absolute
delta, net of builds — both artifacts carry builds as separate _build
lines, so query walls are directly comparable across rounds), and the
build-line diff. Queries below min_sec (default 0.25 s) in BOTH
artifacts are ignored as noise.
"""
import json
import sys


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.25
    old, new = json.load(open(old_p)), json.load(open(new_p))
    qo, qn = old["queries"], new["queries"]
    bo, bn = old.get("builds", {}), new.get("builds", {})

    print(f"total: {old['value']:.1f}s ({len(qo)} q) -> "
          f"{new['value']:.1f}s ({len(qn)} q)")
    print(f"builds: {sum(bo.values()):.1f}s -> {sum(bn.values()):.1f}s")
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    if added:
        print("added:", ", ".join(f"{k} ({qn[k]:.2f}s)" for k in added))
    if removed:
        print("removed:", ", ".join(f"{k} ({qo[k]:.2f}s)" for k in removed))

    deltas = sorted(
        ((qn[k] - qo[k], k) for k in set(qo) & set(qn)
         if max(qo[k], qn[k]) >= floor),
        reverse=True)
    print("\nworst regressions (delta s, old -> new):")
    for d, k in deltas[:10]:
        if d <= 0:
            break
        print(f"  {d:+7.2f}  {qo[k]:7.2f} -> {qn[k]:7.2f}  {k}")
    print("\nbiggest wins:")
    for d, k in deltas[::-1][:10]:
        if d >= 0:
            break
        print(f"  {d:+7.2f}  {qo[k]:7.2f} -> {qn[k]:7.2f}  {k}")

    bd = sorted(((bn.get(k, 0.0) - bo.get(k, 0.0), k)
                 for k in set(bo) | set(bn)
                 if abs(bn.get(k, 0.0) - bo.get(k, 0.0)) >= floor),
                reverse=True)
    if bd:
        print("\nbuild-line deltas:")
        for d, k in bd:
            print(f"  {d:+7.2f}  {bo.get(k, 0.0):7.2f} -> {bn.get(k, 0.0):7.2f}  {k}")


if __name__ == "__main__":
    main()
