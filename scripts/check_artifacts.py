#!/usr/bin/env python3
"""Stress-artifact completeness gate (round-14 verdict ask #4).

Round 14 shipped a subset stress artifact whose commit message said
"all new rows measured" while the artifact carried 11 of 13 declared
keys — nothing asserted measured == declared. This gate closes that:

  1. every SUBSET stress artifact (metric == "stress_subset") from
     round 15 on must declare its scope (`_meta.declared_keys`) and the
     measured surface (queries ∪ errors) must EQUAL that scope;
  2. every FULL/composed stress artifact must have n_queries ==
     len(queries) and n_errors == len(errors) (a partially-written or
     hand-trimmed artifact cannot masquerade as a complete point);
  3. a composed artifact (produced by stress_compose.py, recognized by
     its `posture_detail` field) must carry two-posture detail for every
     query it reports.

Pre-existing round-<15 subset artifacts are grandfathered for rule 1
(their incompleteness is already on the record in VERDICT r14); rules
2-3 apply everywhere.

Run:  python3 scripts/check_artifacts.py   (exit 0 = green)
"""
import json
import pathlib
import re
import sys

root = pathlib.Path(__file__).parent.parent
errors = []

for art_path in sorted(root.glob("BENCH_stress_*.json")):
    try:
        art = json.load(open(art_path))
    except Exception as e:  # unparseable committed artifact is itself a fail
        errors.append(f"{art_path.name}: unparseable ({e})")
        continue
    queries = art.get("queries", {})
    errs = art.get("errors", {})
    measured = set(queries) | set(errs)

    # Round gating: prefer the artifact's own embedded round field (every
    # merged/composed artifact carries one); fall back to the filename's
    # _r<N> token. A subset stress artifact with NEITHER is a gate failure
    # — an unparseable round must not silently bypass the declared-scope
    # rule it exists to enforce (round-15 advice).
    m = re.search(r"_r(\d+)", art_path.name)
    # Coerce the embedded round: a hand-authored artifact with a string
    # round ("16") must be a per-artifact gate error, not a TypeError
    # crashing the whole gate; a round of 0 falls through to the filename
    # like a missing field (round-16 advice).
    try:
        rnd = int(art.get("round") or 0)
    except (TypeError, ValueError):
        errors.append(f"{art_path.name}: unparseable 'round' field "
                      f"({art.get('round')!r})")
        rnd = 0
    rnd = rnd or (int(m.group(1)) if m else 0)

    if art.get("metric") == "stress_subset" and rnd == 0:
        errors.append(f"{art_path.name}: subset stress artifact with no "
                      f"parseable round (neither 'round' field nor _r<N> "
                      f"in the name) — scope gating cannot be bypassed")
    if art.get("metric") == "stress_subset" and rnd >= 15:
        declared = set(art.get("_meta", {}).get("declared_keys", []))
        if not declared:
            errors.append(f"{art_path.name}: subset artifact without "
                          f"_meta.declared_keys (scope undeclared)")
        elif measured != declared:
            errors.append(
                f"{art_path.name}: measured keys != declared scope: "
                f"missing={sorted(declared - measured)} "
                f"extra={sorted(measured - declared)}")

    nq = art.get("n_queries")
    if nq is not None and nq != len(queries):
        errors.append(f"{art_path.name}: n_queries={nq} but "
                      f"{len(queries)} queries present")
    ne = art.get("n_errors")
    if ne is not None and ne != len(errs):
        errors.append(f"{art_path.name}: n_errors={ne} but "
                      f"{len(errs)} errors present")

    if "posture_detail" in art:
        missing = set(queries) - set(art["posture_detail"])
        if missing:
            errors.append(f"{art_path.name}: composed artifact missing "
                          f"posture detail for {sorted(missing)}")

    # 4. stall-canary accounting (round-15 verdict ask #7): a composed
    #    artifact from round 16 on must carry the canary block, and its
    #    stall_flagged set must EQUAL the recompute from its own recorded
    #    per-query canary ratios — a wall whose only measurements come
    #    from stall-era chunks cannot be silently presented as clean.
    if "posture_detail" in art and rnd >= 16:
        if "canary" not in art:
            errors.append(f"{art_path.name}: composed r{rnd} artifact "
                          f"without canary fields")
        else:
            # Mirror stress_compose's rule exactly: per-posture stalled =
            # EITHER the cpu ratio or the shuffle ratio > 2x (each vs its
            # own global floor); flagged if both postures stalled. r16
            # artifacts carry no shuffle ratios in posture_detail — for
            # them the .get(.., 0) defaults reduce this to the cpu-only
            # rule they were composed under (round-16 advice).
            recomputed = {
                q for q, d in art["posture_detail"].items()
                if (d.get("canary_cold", 0) > 2.0
                    or d.get("canary_shuffle_cold", 0) > 2.0)
                and (d.get("canary_warm", 0) > 2.0
                     or d.get("canary_shuffle_warm", 0) > 2.0)}
            recorded = set(art.get("stall_flagged", {}))
            if recomputed != recorded:
                errors.append(
                    f"{art_path.name}: stall_flagged {sorted(recorded)} != "
                    f"recompute from canary ratios {sorted(recomputed)}")

if errors:
    for e in errors:
        print(f"ARTIFACT GATE FAIL: {e}", file=sys.stderr)
    sys.exit(1)
print("ARTIFACT gate green: every stress artifact's measured surface "
      "matches its declared scope / self-reported counts")
