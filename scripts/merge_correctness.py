#!/usr/bin/env python3
"""Merge per-batch local_verify results into one CORRECTNESS-style artifact.

Usage: merge_correctness.py <out.json> <meta_json_str> <input ...>

Inputs are either local_verify --json artifacts (preferred: full per-query
records) or local_verify stdout logs (fallback for batches whose process
died after printing results but before writing the json — only PASS lines
are reconstructed from a log, and only when no json covers that query;
a FAIL needs the json's err detail, so failed log-only queries must be
re-run, not reconstructed).

Later inputs override earlier ones for the same query (ordering is the
retry chain: put the final big-budget retry last). A query that ever
passed stays passed — a retry cannot demote a recorded pass, since every
pass is a completed strict compare on the same dump.
"""
import json
import re
import sys


def main():
    out, meta_str = sys.argv[1], sys.argv[2]
    report = {}
    for f in sys.argv[3:]:
        if f.endswith(".json"):
            d = json.load(open(f))
            for k, v in d.items():
                if not isinstance(v, dict):
                    continue
                if report.get(k, {}).get("hash_match") and not v.get("hash_match"):
                    continue  # never demote a recorded pass
                report[k] = v
        else:
            for line in open(f):
                m = re.match(r"PASS (\w+) \((\d+) rows\)", line)
                if m and m.group(1) not in report:
                    n = int(m.group(2))
                    report[m.group(1)] = {
                        "rows_match": True, "schema_match": True,
                        "hash_match": True, "spark_rows": n,
                        "oracle_rows": n, "err": None}
    meta = json.loads(meta_str)
    meta["n_pass"] = sum(1 for v in report.values() if v.get("hash_match"))
    meta["n_blocker"] = len(report) - meta["n_pass"]
    art = {"_meta": meta}
    for k in sorted(report):
        art[k] = report[k]
    json.dump(art, open(out, "w"), indent=1)
    print(out, "pass", meta["n_pass"], "blocker", meta["n_blocker"],
          "total", len(report))
    for k, v in sorted(report.items()):
        if not v.get("hash_match"):
            print("  BLOCKER", k, (v.get("err") or "")[:100])


if __name__ == "__main__":
    main()
