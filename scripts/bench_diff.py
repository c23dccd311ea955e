#!/usr/bin/env python3
"""Noise-aware per-query diff of Bench artifacts (round-13 verdict ask #2).

Usage: python3 scripts/bench_diff.py <old.json> <new.json> [new2.json ...]
       [--min-sec S] [--json out.json]

The box carries variable external load (BENCH_rebaseline_r11..r13:
single-sample walls on unchanged plans swing 1.3-1.5x; r13's driver n=1
closing run re-flagged 8 pinned-min queries at a uniform 1.52x — the
third consecutive round of manufactured flags). So a REGRESSION is only
flagged when ALL of:
  1. absolute delta >= 1.0 s,
  2. ratio new/old >= 1.5x,
  3. reproduced in >= 2 of the provided new samples (or in the single
     sample when only one is given — then the flag is explicitly marked
     UNADJUDICATED: a single sample cannot distinguish a plan regression
     from box load; re-run with >= 3 interleaved samples to adjudicate).
Comparisons additionally use the per-query MIN across the new samples as
the estimator (the rebaseline methodology), so a single loaded sample
cannot manufacture a flag when its siblings are clean.

Also prints a global-inflation diagnostic: the median per-query ratio.
A uniform inflation (every query ~1.5x) is the signature of external box
load, not a plan change — per-query flags under high global inflation
are almost certainly noise.
"""
import json
import statistics
import sys

FLAG_DELTA_S = 1.0
FLAG_RATIO = 1.5
FLAG_MIN_SAMPLES = 2


def main():
    argv = sys.argv[1:]
    floor, json_out = 0.25, None
    if "--min-sec" in argv:
        i = argv.index("--min-sec")
        floor = float(argv[i + 1])
        argv = argv[:i] + argv[i + 2:]
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    old_p, new_ps = argv[0], argv[1:]

    def load(p):
        d = json.load(open(p))
        # driver wrapper shape: {"n":…, "parsed": {…}} with the artifact inside
        if "queries" not in d and isinstance(d.get("parsed"), dict):
            d = d["parsed"]
        if "queries" not in d:
            sys.exit(f"{p}: no 'queries' map (driver wrapper without parsed "
                     f"block? keys={sorted(d)[:8]})")
        return d

    old = load(old_p)
    news = [load(p) for p in new_ps]
    qo = old["queries"]
    qns = [n["queries"] for n in news]
    # the estimator for "new" is the per-query min across samples
    common = set(qo)
    for q in qns:
        common &= set(q)
    qn = {k: min(q[k] for q in qns) for k in common}
    bo = old.get("builds", {})
    bn = news[-1].get("builds", {})

    tot_new = sum(sum(q.values()) for q in qns) / len(qns)
    print(f"old: {old['value']:.1f}s ({len(qo)} q) [{old_p}]")
    for p, q in zip(new_ps, qns):
        print(f"new: {sum(q.values()):.1f}s queries ({len(q)} q) [{p}]")
    added = sorted(set(qns[0]) - set(qo))
    removed = sorted(set(qo) - set(qns[0]))
    if added:
        print("added:", ", ".join(f"{k} ({qns[0][k]:.2f}s)" for k in added))
    if removed:
        print("removed:", ", ".join(f"{k} ({qo[k]:.2f}s)" for k in removed))

    ratios = sorted(qn[k] / qo[k] for k in common if qo[k] >= floor)
    med = statistics.median(ratios) if ratios else 1.0
    print(f"\nglobal inflation (median per-query min-ratio, n={len(ratios)}): "
          f"{med:.2f}x" + ("  << uniform-load signature, treat flags as noise"
                           if med >= 1.3 else ""))

    # regression rule, per query
    flags = []
    for k in sorted(common):
        if max(qo[k], qn[k]) < floor:
            continue
        hits = [q[k] for q in qns
                if q[k] - qo[k] >= FLAG_DELTA_S and q[k] >= FLAG_RATIO * qo[k]]
        # the min across samples must itself violate, AND enough samples agree
        if (qn[k] - qo[k] >= FLAG_DELTA_S and qn[k] >= FLAG_RATIO * qo[k]
                and len(hits) >= min(FLAG_MIN_SAMPLES, len(qns))):
            flags.append({"query": k, "old": qo[k], "new_min": qn[k],
                          "samples": [q[k] for q in qns],
                          "adjudicated": len(qns) >= 3})
    if flags:
        print(f"\nREGRESSIONS (delta>={FLAG_DELTA_S}s AND ratio>={FLAG_RATIO}x"
              f" AND >= {min(FLAG_MIN_SAMPLES, len(qns))}/{len(qns)} samples):")
        for f in flags:
            tag = "" if f["adjudicated"] else "  [UNADJUDICATED: single/dual sample]"
            print(f"  {f['old']:7.2f} -> {f['new_min']:7.2f}  {f['query']}"
                  f"  samples={['%.2f' % s for s in f['samples']]}{tag}")
    else:
        print(f"\nno regressions under the noise rule (delta>={FLAG_DELTA_S}s "
              f"AND ratio>={FLAG_RATIO}x AND reproduced across samples)")

    deltas = sorted(((qn[k] - qo[k], k) for k in common
                     if max(qo[k], qn[k]) >= floor), reverse=True)
    print("\nlargest raw deltas (min-estimator, informational):")
    for d, k in deltas[:8]:
        print(f"  {d:+7.2f}  {qo[k]:7.2f} -> {qn[k]:7.2f}  {k}")
    print("biggest wins:")
    for d, k in deltas[::-1][:8]:
        if d >= 0:
            break
        print(f"  {d:+7.2f}  {qo[k]:7.2f} -> {qn[k]:7.2f}  {k}")

    bd = sorted(((bn.get(k, 0.0) - bo.get(k, 0.0), k)
                 for k in set(bo) | set(bn)
                 if abs(bn.get(k, 0.0) - bo.get(k, 0.0)) >= floor),
                reverse=True)
    if bd:
        print("\nbuild-line deltas (last sample):")
        for d, k in bd:
            print(f"  {d:+7.2f}  {bo.get(k, 0.0):7.2f} -> {bn.get(k, 0.0):7.2f}  {k}")

    if json_out:
        with open(json_out, "w") as f:
            json.dump({"old": old_p, "new": new_ps, "n_samples": len(qns),
                       "median_inflation": round(med, 3),
                       "rule": f"delta>={FLAG_DELTA_S}s AND ratio>={FLAG_RATIO}x "
                               f"AND >= {min(FLAG_MIN_SAMPLES, len(qns))}/{len(qns)} samples",
                       "regressions": flags}, f, indent=2)
        print(f"\nwrote {json_out}")
    sys.exit(0)


if __name__ == "__main__":
    main()
