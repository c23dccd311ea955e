#!/usr/bin/env python3
"""Build a Nx shifted-copy stress set from a testdata dir.

Usage: python3 scripts/make_stress_data.py [src_sfdir] [out_dir] [N]

Duplicates every table N times with key offsets (so joins stay valid and
ids stay unique) and keeps events.ts at parquet timestamp[ns] so Spark
reads it identically to the driver testdata. Documents/embeddings copies
are byte-identical per stripe — intentionally: near-dup and dedup
operators must cope with heavy duplicate clusters, and this set measures
exactly that. Caught in round 3: 8-bit SimHash bands went quadratic at
10x; run new bucketed operators through this before trusting them.
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sfx1"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    # At N=1000 the lineitem copy is 600M rows; with insertion-order
    # preservation DuckDB buffers the whole COPY result (~90 GB observed)
    # before writing. Row order within a stress table is irrelevant —
    # every consumer sorts or aggregates — so stream the copy under a
    # hard memory ceiling instead.
    con.sql("SET preserve_insertion_order=false")
    con.sql(f"SET memory_limit='{os.environ.get('STRESS_GEN_MEM', '24GB')}'")
    threads = os.environ.get("STRESS_GEN_THREADS")
    if threads:
        con.sql(f"SET threads={int(threads)}")
    k = f"(SELECT unnest(range({n})) AS k)"
    copies = {
        "documents": "SELECT doc_id + k*5000000 AS doc_id, text, lang, source, n_chars",
        "embeddings": "SELECT vec_id + k*5000000 AS vec_id, embedding, label",
        "events": ("SELECT event_id + k*5000000 AS event_id, ts::TIMESTAMP_NS AS ts, "
                   "user_id + k*100000 AS user_id, event_type, value, props"),
        "lineitem": ("SELECT l_orderkey + k*5000000 AS l_orderkey, l_partkey, l_suppkey, "
                     "l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax, "
                     "l_returnflag, l_linestatus, l_shipdate"),
        "orders": ("SELECT o_orderkey + k*5000000 AS o_orderkey, o_custkey + k*500000 AS o_custkey, "
                   "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"),
        "customer": ("SELECT c_custkey + k*500000 AS c_custkey, c_name, c_nationkey, "
                     "c_acctbal, c_mktsegment"),
    }
    for t, sel in copies.items():
        con.sql(f"COPY ({sel} FROM '{src}/{t}.parquet', {k}) "
                f"TO '{out}/{t}.parquet' (FORMAT parquet)")
    for t in ["supplier", "part", "nation", "region"]:
        con.sql(f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{out}/{t}.parquet' (FORMAT parquet)")
    # DuckDB writes TIMESTAMP_NS as us; rewrite events.ts to true ns so the
    # Spark side (nanosAsLong) sees the same physical type as the testdata
    tbl = pq.read_table(f"{out}/events.parquet")
    i = tbl.schema.get_field_index("ts")
    tbl = tbl.set_column(i, pa.field("ts", pa.timestamp("ns")),
                         tbl.column("ts").cast(pa.timestamp("ns")))
    pq.write_table(tbl, f"{out}/events.parquet", version="2.6")
    for t in list(copies) + ["supplier", "part", "nation", "region"]:
        f = pq.ParquetFile(f"{out}/{t}.parquet")
        print(t, f.metadata.num_rows, "rows")


if __name__ == "__main__":
    main()
