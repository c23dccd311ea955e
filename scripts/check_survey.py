#!/usr/bin/env python3
"""SURVEY.md structural gate (round-13 verdict ask #6).

Asserts the §2 inventory table stays well-formed so row numbers remain a
stable citation key across rounds:
  1. row numbers are exactly 1..N, unique and monotone (no duplicates,
     no gaps — the round-12 table reused 188/189);
  2. the §7 prose row count ("All N inventory rows") matches the table;
  3. every non-test-only row names at least one `queries` key in
     backticks (the coverage contract column is populated).

Run:  python3 scripts/check_survey.py   (exit 0 = green)
"""
import re
import sys
import pathlib

survey = (pathlib.Path(__file__).parent.parent / "SURVEY.md").read_text()

rows = []
in_s2 = False
for line in survey.split("\n"):
    if line.startswith("## §2"):
        in_s2 = True
        continue
    if in_s2 and line.startswith("## §") and not line.startswith("## §2"):
        in_s2 = False
    m = re.match(r"^\| (\d+) \|", line)
    if in_s2 and m:
        rows.append((int(m.group(1)), line))

errors = []
nums = [n for n, _ in rows]
expect = list(range(1, len(rows) + 1))
if nums != expect:
    dups = sorted({n for n in nums if nums.count(n) > 1})
    gaps = sorted(set(expect) - set(nums))
    errors.append(f"row numbers not 1..{len(rows)} monotone-unique: "
                  f"dups={dups} gaps={gaps}")

m = re.search(r"All (\d+) inventory rows", survey)
if not m:
    errors.append('§7 prose count ("All N inventory rows") not found')
elif int(m.group(1)) != len(rows):
    errors.append(f"§7 prose says {m.group(1)} rows, table has {len(rows)}")

for n, line in rows:
    # rows contain unescaped '|' inside prose (|types|² etc.), so a naive
    # cell split is unreliable — gate on the whole line: every row either
    # names a backticked snake_case queries key or is a test-only row
    # (keys cell starts with an em-dash marker "— (").
    has_key = re.search(r"`[a-z][a-z0-9_]*`", line)
    is_test = "— (" in line or "test-only" in line
    if not has_key and not is_test:
        errors.append(f"row {n}: no backticked queries key and no test-only marker")

if errors:
    for e in errors:
        print(f"SURVEY GATE FAIL: {e}", file=sys.stderr)
    sys.exit(1)
print(f"SURVEY gate green: {len(rows)} rows, numbering 1..{len(rows)}, "
      f"prose count matches, every non-test row names a key")

# ---- round-14 invariants (round-13 verdict ask #6): prose must track the
# spec constants and the committed artifacts, by construction -------------

import json

root = pathlib.Path(__file__).parent.parent
errors2 = []

# 4. collect-site count prose == CollectGateSpec.ExpectedSites
spec = (root / "src/test/scala/graft/CollectGateSpec.scala").read_text()
m_spec = re.search(r"ExpectedSites = (\d+)", spec)
m_prose = re.search(r"site count\s+pinned at (\d+)", survey)
if not m_spec:
    errors2.append("CollectGateSpec.ExpectedSites not found")
elif not m_prose:
    errors2.append('SURVEY collect-count prose ("site count pinned at N") not found')
elif m_spec.group(1) != m_prose.group(1):
    errors2.append(f"SURVEY says collect sites pinned at {m_prose.group(1)}, "
                   f"CollectGateSpec pins {m_spec.group(1)}")

# 5. crossJoin-site count prose == CrossJoinGateSpec.ExpectedSites (when prose states one)
xspec_p = root / "src/test/scala/graft/CrossJoinGateSpec.scala"
if xspec_p.exists():
    m_xspec = re.search(r"ExpectedSites = (\d+)", xspec_p.read_text())
    m_xprose = re.search(r"crossJoin sites?\s+pinned at (\d+)", survey)
    if m_xspec and m_xprose and m_xspec.group(1) != m_xprose.group(1):
        errors2.append(f"SURVEY says crossJoin sites pinned at {m_xprose.group(1)}, "
                       f"CrossJoinGateSpec pins {m_xspec.group(1)}")

# 6. the 1000x headline total quoted in SURVEY == the newest committed
#    1000x stress artifact's total_sec. "Newest" = highest EMBEDDED round
#    number (lexicographic filename sort misorders r9 vs r10 — round-14
#    advice); subset-scoped artifacts (metric == stress_subset) measure a
#    named key list, not the registry headline, and are skipped.


def _round_of(path):
    m = re.search(r"_r(\d+)", path.name)
    return int(m.group(1)) if m else -1


arts = sorted((a for a in root.glob("BENCH_stress_r*_1000x.json")
               if json.load(open(a)).get("metric") != "stress_subset"),
              key=_round_of)
m_head = re.search(r"1000× headline: (\d+) queries, (\d+) errors, ([\d.]+) s total", survey)
if arts and m_head:
    art = json.load(open(arts[-1]))
    want = (art.get("n_queries"), art.get("n_errors"), art.get("total_sec"))
    got = (int(m_head.group(1)), int(m_head.group(2)), float(m_head.group(3)))
    if want != got:
        errors2.append(f"SURVEY 1000× headline {got} != {arts[-1].name} {want}")
    # staleness (round-14 advice): a headline artifact covering fewer
    # queries than the live registry means the full-registry 1000× point
    # was never re-run after the registry grew — fail until rebaselined.
    # keys cell = 3rd-from-last cell (prose cells contain unescaped '|',
    # so split from the END — the tail cells are well-formed)
    s2_keys = {k for _, line in rows
               for k in re.findall(r"`([a-z][a-z0-9_]*)`",
                                   line.rsplit("|", 4)[1])}
    sys.path.insert(0, str(pathlib.Path(__file__).parent))
    from make_chunks import EXPANDED_OPT_INS
    expected_n = len(s2_keys - EXPANDED_OPT_INS)
    if art.get("n_queries", 0) < expected_n:
        # warn, not fail (round-14 advice wording): the debt is real but a
        # missing rebaseline must not mask OTHER gate failures by making
        # every commit red until an hour-long 1000x run completes
        print(f"SURVEY GATE WARN: 1000× headline artifact {arts[-1].name} "
              f"covers {art.get('n_queries')} queries but the registry has "
              f"{expected_n} stress-eligible keys — full-registry 1000× "
              f"rebaseline required", file=sys.stderr)
elif not m_head:
    errors2.append('SURVEY 1000× headline prose not found')

# 7. artifact references must EXIST (round-16 verdict ask #2): SURVEY r16
#    claimed three evidence artifacts "recorded" that were never created.
#    Every uppercase-starting .json/.md filename SURVEY names must be a
#    real file in the repo root — prose cannot point at artifacts that do
#    not exist. Brace sets ({cold,warm}) expand; lowercase names
#    (oracle_sql.json — a per-run output, not a committed artifact) are
#    out of scope.
import itertools

for tok in set(re.findall(r"\b[A-Z][A-Za-z0-9_]*(?:\{[A-Za-z0-9_,]+\}"
                          r"[A-Za-z0-9_]*)*\.(?:json|md)\b", survey)):
    parts = re.split(r"(\{[A-Za-z0-9_,]+\})", tok)
    alts = [p[1:-1].split(",") if p.startswith("{") else [p] for p in parts]
    for combo in itertools.product(*alts):
        name = "".join(combo)
        if not (root / name).exists():
            errors2.append(f"SURVEY names artifact {name} (from '{tok}') "
                           f"but no such file exists in the repo")

if errors2:
    for e in errors2:
        print(f"SURVEY GATE FAIL: {e}", file=sys.stderr)
    sys.exit(1)
print("SURVEY artifact invariants green: collect-count prose == spec constant, "
      "crossJoin prose (if stated) == spec constant, 1000× headline == committed artifact")

# 8. the same artifact-reference gate over OPTIMIZATION_*.md (round-17
#    verdict ask #2): r17's optimization report promised
#    BENCH_stress_r17_rangejoin_layout.json — the file was never created
#    and only SURVEY.md was gated, so the placeholder shipped. Every
#    uppercase-starting .json/.md filename an OPTIMIZATION report names
#    must exist in the repo root. Filenames the prose explicitly marks as
#    hypothetical ("or rNN", "never produced", "absent") still count —
#    name only artifacts that exist.
errors3 = []
for opt in sorted(root.glob("OPTIMIZATION_r*.md")):
    text = opt.read_text()
    for tok in set(re.findall(r"\b[A-Z][A-Za-z0-9_]*(?:\{[A-Za-z0-9_,]+\}"
                              r"[A-Za-z0-9_]*)*\.(?:json|md)\b", text)):
        parts = re.split(r"(\{[A-Za-z0-9_,]+\})", tok)
        alts = [p[1:-1].split(",") if p.startswith("{") else [p] for p in parts]
        for combo in itertools.product(*alts):
            name = "".join(combo)
            if not (root / name).exists():
                errors3.append(f"{opt.name} names artifact {name} (from "
                               f"'{tok}') but no such file exists in the repo")

if errors3:
    for e in errors3:
        print(f"OPTIMIZATION GATE FAIL: {e}", file=sys.stderr)
    sys.exit(1)
print("OPTIMIZATION artifact references green: every artifact named in "
      "OPTIMIZATION_*.md exists in the repo root")
