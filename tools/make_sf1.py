#!/usr/bin/env python3
"""Deterministic sf1 scale-up of the driver's sf0.1 tables (driver-side tool,
not part of the Scala library).

10 key-shifted copies of every fact table, derived ONLY from the driver's
parquet (TESTDATA.md) — no new synthetic distributions. Each copy is
self-consistent: every FK key column is shifted by the same copy offset, so
joins behave exactly like the original at 10x the rows. Dimension tables
(region, nation) stay fixed, like TPC-H at all SFs.

Text/vector salting: copy 0 is byte-identical to sf0.1; copies 1..9 get a
' v<i>' text suffix and a +i*1e-3 vector component shift so the dedup/ANN
operators see 10x corpus, not 10 exact clones of every row (which would
inflate pair generators quadratically and tell us nothing new).

Usage: python3 tools/make_sf1.py [outDir=/tmp/sf1]
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
COPIES = 10
OFF = 100_000_000  # key offset per copy; far above any sf0.1 key

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")

def copies_sql(body):
    """UNION ALL of `body` with i = 0..COPIES-1 (deterministic order)."""
    return " UNION ALL ".join(body.format(i=i) for i in range(COPIES))

TABLES = {
    # dimensions: fixed at all SFs
    "region": f"SELECT * FROM '{SRC}/region.parquet'",
    "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
    "customer": copies_sql(
        f"SELECT c_custkey + {{i}}*{OFF} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"),
    "supplier": copies_sql(
        f"SELECT s_suppkey + {{i}}*{OFF} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM '{SRC}/supplier.parquet'"),
    "part": copies_sql(
        f"SELECT p_partkey + {{i}}*{OFF} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM '{SRC}/part.parquet'"),
    "orders": copies_sql(
        f"SELECT o_orderkey + {{i}}*{OFF} AS o_orderkey, "
        f"o_custkey + {{i}}*{OFF} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'"),
    "lineitem": copies_sql(
        f"SELECT l_orderkey + {{i}}*{OFF} AS l_orderkey, "
        f"l_partkey + {{i}}*{OFF} AS l_partkey, "
        f"l_suppkey + {{i}}*{OFF} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM '{SRC}/lineitem.parquet'"),
    "events": copies_sql(
        f"SELECT event_id + {{i}}*{OFF} AS event_id, ts, "
        f"user_id + {{i}}*{OFF} AS user_id, event_type, value, props "
        f"FROM '{SRC}/events.parquet'"),
    "documents": copies_sql(
        f"SELECT doc_id + {{i}}*{OFF} AS doc_id, "
        f"CASE WHEN {{i}} = 0 THEN text ELSE text || ' v{{i}}' END AS text, "
        f"lang, source, "
        # n_chars == length(text) holds in the source (checked); keep it true
        f"length(CASE WHEN {{i}} = 0 THEN text ELSE text || ' v{{i}}' END) "
        f"AS n_chars FROM '{SRC}/documents.parquet'"),
    "embeddings": copies_sql(
        f"SELECT vec_id + {{i}}*{OFF} AS vec_id, "
        f"list_transform(embedding, x -> x + {{i}}*1e-3)::FLOAT[] AS embedding, "
        f"label FROM '{SRC}/embeddings.parquet'"),
}

for name, sql in TABLES.items():
    dest = f"{OUT}/{name}.parquet"
    con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
    print(f"{name}: {n} rows -> {dest}")
print("done")
