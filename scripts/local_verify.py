#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/local_verify.py <sfdir> <outdir> [query ...]
       [--json artifact.json]

Assumes `sbt "runMain graft.Verify <sfdir> <outdir>"` already ran. For each
query: load the Spark parquet result, run the oracle SQL in DuckDB against
views over the same testdata parquet, sort columns by name, and compare
values exactly, in row order. Strictest interpretation of the driver's
compare — if this passes, the driver's hash match passes.
"""
import duckdb
import glob
import json
import math
import os
import sys
import threading

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sfdir, outdir = argv[0], argv[1]
    only = set(argv[2:])
    con = duckdb.connect()
    # Scaled sweeps run next to a large Spark JVM: without a cap DuckDB
    # sizes itself to ~80% of physical RAM and the OOM killer takes the
    # whole sweep down (observed exit 137 at the sfx100 point). Capped,
    # it spills to disk instead and the sweep degrades per-query.
    mem = os.environ.get("GRAFT_ORACLE_MEM", "")
    if mem:
        con.sql(f"SET memory_limit='{mem}'")
        # per-process spill dir: two parallel sweep batches must not
        # share (or mutually clean up) one spill directory
        con.sql(f"SET temp_directory='/tmp/duckdb_oracle_spill_{os.getpid()}'")
        # An unbounded spill is as fatal as unbounded RAM: one heavy
        # oracle (ivfpq re-rank at the sfx100 point) filled the whole
        # disk before erroring. Bound it so a spill-heavy oracle fails
        # ITSELF and is recorded as a blocker, instead of starving every
        # other process on the box.
        con.sql("SET max_temp_directory_size='"
                + os.environ.get("GRAFT_ORACLE_MAXSPILL", "20GB") + "'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    # Fail loudly on a misspelled subset name: a filter that matches
    # nothing would otherwise print "0 pass, 0 fail" and exit 0 — a green
    # run that verified nothing.
    unknown = only - set(oracle)
    if unknown:
        print(f"FAIL: unknown query name(s): {sorted(unknown)}")
        sys.exit(2)
    selected = [n for n in sorted(oracle) if not only or n in only]
    if not selected:
        print("FAIL: selection matched no queries")
        sys.exit(2)
    n_pass = n_fail = 0
    # Per-query records in the driver's CORRECTNESS_r{N}.json shape so a
    # local sweep (e.g. the sf1-scale gate) can be committed as an artifact.
    report = {}

    def record(name, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {
            "rows_match": rows_match, "schema_match": schema_match,
            "hash_match": hash_match, "spark_rows": spark_rows,
            "oracle_rows": oracle_rows, "err": err}

    for name in selected:
        sql = oracle[name]
        files = sorted(glob.glob(f"{outdir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            record(name, err="no spark output")
            n_fail += 1
            continue
        # Optional per-query oracle timeout (GRAFT_ORACLE_TIMEOUT seconds):
        # at sf1-scale sweeps one pathological DuckDB plan must become a
        # documented per-query blocker, not a hung gate. duckdb honors
        # con.interrupt() from another thread.
        timeout_s = float(os.environ.get("GRAFT_ORACLE_TIMEOUT", "0") or 0)
        timer = None
        if timeout_s > 0:
            timer = threading.Timer(timeout_s, con.interrupt)
            timer.start()
        try:
            odf = con.sql(sql).df()
        except Exception as e:
            msg = str(e)
            if "INTERRUPT" in msg.upper():
                msg = f"oracle timeout after {timeout_s:.0f}s (DuckDB-side blocker)"
            print(f"FAIL {name}: oracle error: {msg[:300]}")
            record(name, err=f"oracle error: {msg[:300]}")
            n_fail += 1
            continue
        finally:
            if timer is not None:
                timer.cancel()
        sdf = con.sql(
            "SELECT * FROM read_parquet([" +
            ",".join(f"'{f}'" for f in files) + "])").df()
        ocols, scols = sorted(odf.columns), sorted(sdf.columns)
        if ocols != scols:
            print(f"FAIL {name}: schema mismatch spark={scols} oracle={ocols}")
            record(name, spark_rows=len(sdf), oracle_rows=len(odf),
                   err=f"schema mismatch spark={scols} oracle={ocols}")
            n_fail += 1
            continue
        if len(odf) != len(sdf):
            print(f"FAIL {name}: rows spark={len(sdf)} oracle={len(odf)}")
            record(name, schema_match=True, spark_rows=len(sdf),
                   oracle_rows=len(odf), err="row count mismatch")
            n_fail += 1
            continue
        odf, sdf = odf[ocols], sdf[ocols]
        # The driver hashes TYPED values: a DuckDB HUGEINT surfacing as
        # float64 fails its hash even when every value compares equal in
        # Python (events_pivot, round 4). It does NOT distinguish integer
        # widths (int32 rank vs int64 rank hash-matched in round 4). So
        # mirror it at dtype-KIND granularity: int==int regardless of
        # width, but int vs float/decimal/object is a failure.
        def kind(dt):
            k = dt.kind
            return "i" if k in ("i", "u") else k
        dtdiff = {c: (str(sdf[c].dtype), str(odf[c].dtype))
                  for c in ocols
                  if kind(odf[c].dtype) != kind(sdf[c].dtype)}
        if dtdiff:
            print(f"FAIL {name}: dtype-kind mismatch (spark, oracle): "
                  f"{dtdiff}")
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   err=f"dtype-kind mismatch (spark, oracle): {dtdiff}")
            n_fail += 1
            continue
        bad = None
        for c in ocols:
            ov, sv = odf[c].tolist(), sdf[c].tolist()
            for i, (a, b) in enumerate(zip(ov, sv)):
                eq = (a == b)
                if not eq and isinstance(a, float) and isinstance(b, float):
                    eq = (math.isnan(a) and math.isnan(b))
                if not eq:
                    bad = (c, i, a, b)
                    break
            if bad:
                break
        if bad:
            c, i, a, b = bad
            print(f"FAIL {name}: col={c} row={i} spark={b!r} oracle={a!r}")
            record(name, rows_match=True, schema_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf),
                   err=f"value mismatch col={c} row={i} "
                       f"spark={b!r} oracle={a!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=len(sdf), oracle_rows=len(odf))
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    if json_out:
        with open(json_out, "w") as f:
            json.dump(dict(sorted(report.items())), f, indent=2)
        print(f"wrote {json_out} ({len(report)} queries)")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
