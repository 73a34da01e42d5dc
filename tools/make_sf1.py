#!/usr/bin/env python3
"""Build a TRUE sf1 bench corpus (~10x sf0.1 on EVERY table) with
referential integrity preserved — the full-surface scale rung SCALE.md's
sf1ish corpus (which amplified only documents/embeddings) did not cover.

Dev/bench tool only — the shipped Scala library does not depend on this.

Protocol: 10 shifted copies of every fact table (copy i=0 is the
original, so fixtures that require specific ids — PQ init ids 0..k-1,
mm doc_id arithmetic — keep working). Key shifts are consistent across
tables so every join keeps exactly its sf0.1 selectivity per copy:
  orderkey +i*10M, custkey +i*1M, partkey +i*1M, suppkey +i*100k,
  user/doc/vec ids +i*1M. nation/region stay fixed (constant dims, as
  in TPC-H itself). documents get the near-dup-adversarial ' copyvar<i>'
  suffix (the sf1ish/sf10ish shape); embeddings copy vectors verbatim.

Usage: python3 tools/make_sf1.py [outDir]   (default /tmp/sf1full)
"""
import sys, os
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1full"
N = 10

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()

AMPLIFY = {
    "lineitem": """SELECT l_orderkey + i*10000000 AS l_orderkey,
        l_partkey + i*1000000 AS l_partkey, l_suppkey + i*100000 AS l_suppkey,
        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        l_returnflag, l_linestatus, l_shipdate""",
    "orders": """SELECT o_orderkey + i*10000000 AS o_orderkey,
        o_custkey + i*1000000 AS o_custkey, o_orderstatus, o_totalprice,
        o_orderdate, o_orderpriority""",
    "customer": """SELECT c_custkey + i*1000000 AS c_custkey, c_name,
        c_nationkey, c_acctbal, c_mktsegment""",
    "part": """SELECT p_partkey + i*1000000 AS p_partkey, p_name, p_brand,
        p_type, p_size, p_retailprice""",
    "supplier": """SELECT s_suppkey + i*100000 AS s_suppkey, s_name,
        s_nationkey, s_acctbal""",
    "events": """SELECT event_id + i*100000000 AS event_id, ts,
        user_id + i*1000000 AS user_id, event_type, value, props""",
    "documents": """SELECT doc_id + i*1000000 AS doc_id,
        text || ' copyvar' || CAST(i AS VARCHAR) AS text,
        lang, source, n_chars + 10 AS n_chars""",
    "embeddings": """SELECT vec_id + i*1000000 AS vec_id, embedding, label""",
}
COPY_VERBATIM = ["nation", "region"]

for t, sel in AMPLIFY.items():
    con.execute(
        f"COPY ({sel} FROM '{SRC}/{t}.parquet', range({N}) r(i)) "
        f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(f"{t:12s} {n:>10,}")
for t in COPY_VERBATIM:
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t:12s} verbatim")
print(f"sf1 corpus at {OUT}")
