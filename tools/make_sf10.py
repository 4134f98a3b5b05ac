#!/usr/bin/env python3
"""Deterministic sf10 scale-up of the driver's sf0.1 tables (driver-side
tool, not part of the Scala library) — the r9 scale probe's data.

100 key-shifted copies of every fact table, derived ONLY from the driver's
parquet (same contract as make_sf1.py). Copy c splits into family f = c%10
and generation g = c//10:

 - family (same g, f = 0..9): the sf1 recipe — a ' v<f>' text suffix /
   +f*1e-3 embedding shift — so each document keeps a 10-member NEAR-DUP
   family, exactly the duplication depth sf1 has;
 - generation (g = 0..9): every 5th word gets a '_g<g>' suffix (g=0 is the
   untouched sf1 text), which breaks >half the word shingles, so texts of
   different generations are NOT near-dups; embeddings rotate components by
   g positions (rotations of random vectors are ~orthogonal), so vector
   families don't merge either.

Why this matters: naive 100x cloning would deepen every near-dup family to
100 members, growing the pair generators' OUTPUT ~quadratically in the copy
count — the sf1→sf10 slope would measure the data design, not the plan.
With bounded families, near-dup pairs scale linearly with corpus size, the
real-corpus assumption the operators document.

Usage: python3 tools/make_sf10.py [outDir=/tmp/sf10] [copies=100]
(copies=1000 -> sf100: generation g = c//10 spans 0..99; text family depth stays 10)
"""
import os, sys
import duckdb

SRC = "/root/testdata/sf0.1"
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf10"
COPIES = int(sys.argv[2]) if len(sys.argv) > 2 else 100
OFF = 100_000_000  # key offset per copy; far above any sf0.1 key

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("SET preserve_insertion_order=false")
con.execute("SET max_expression_depth=20000")  # 1000-way UNION ALL nests past the 1000 default
con.execute("SET memory_limit='64GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")


def copies_sql(body):
    """UNION ALL of `body` with c = 0..COPIES-1 (f=c%10, g=c//10)."""
    return " UNION ALL ".join(
        body.format(c=c, f=c % 10, g=c // 10, shift=c * OFF)
        for c in range(COPIES))


def doc_text():
    """Text for copy (f, g): generation word-salt then family suffix."""
    gen = ("CASE WHEN {g} = 0 THEN text ELSE array_to_string("
           "list_transform(string_split(text, ' '), (w, i) -> "
           "CASE WHEN i % 5 = 0 THEN w || '_g{g}' ELSE w END), ' ') END")
    return (f"CASE WHEN {{f}} = 0 THEN {gen} "
            f"ELSE {gen} || ' v{{f}}' END")


def emb_vec():
    """Embedding for copy (f, g): rotate by g, shift by f*1e-3."""
    rot = ("CASE WHEN {g} = 0 THEN embedding "
           "ELSE list_concat(embedding[{g}+1:], embedding[:{g}]) END")
    return f"list_transform({rot}, x -> x + {{f}}*1e-3)::FLOAT[]"


TABLES = {
    # dimensions: fixed at all SFs
    "region": f"SELECT * FROM '{SRC}/region.parquet'",
    "nation": f"SELECT * FROM '{SRC}/nation.parquet'",
    "customer": copies_sql(
        f"SELECT c_custkey::BIGINT + {{shift}} AS c_custkey, c_name, c_nationkey, "
        f"c_acctbal, c_mktsegment FROM '{SRC}/customer.parquet'"),
    "supplier": copies_sql(
        f"SELECT s_suppkey::BIGINT + {{shift}} AS s_suppkey, s_name, s_nationkey, "
        f"s_acctbal FROM '{SRC}/supplier.parquet'"),
    "part": copies_sql(
        f"SELECT p_partkey::BIGINT + {{shift}} AS p_partkey, p_name, p_brand, p_type, "
        f"p_size, p_retailprice FROM '{SRC}/part.parquet'"),
    "orders": copies_sql(
        f"SELECT o_orderkey::BIGINT + {{shift}} AS o_orderkey, "
        f"o_custkey::BIGINT + {{shift}} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority FROM '{SRC}/orders.parquet'"),
    "lineitem": copies_sql(
        f"SELECT l_orderkey::BIGINT + {{shift}} AS l_orderkey, "
        f"l_partkey::BIGINT + {{shift}} AS l_partkey, "
        f"l_suppkey::BIGINT + {{shift}} AS l_suppkey, l_linenumber, l_quantity, "
        f"l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, "
        f"l_shipdate FROM '{SRC}/lineitem.parquet'"),
    "events": copies_sql(
        f"SELECT event_id::BIGINT + {{shift}} AS event_id, ts, "
        f"user_id::BIGINT + {{shift}} AS user_id, event_type, value, props "
        f"FROM '{SRC}/events.parquet'"),
    "documents": copies_sql(
        f"SELECT doc_id::BIGINT + {{shift}} AS doc_id, "
        f"{doc_text()} AS text, lang, source, "
        f"length({doc_text()}) AS n_chars FROM '{SRC}/documents.parquet'"),
    "embeddings": copies_sql(
        f"SELECT vec_id::BIGINT + {{shift}} AS vec_id, "
        f"{emb_vec()} AS embedding, label FROM '{SRC}/embeddings.parquet'"),
}

for name, sql in TABLES.items():
    dest = f"{OUT}/{name}.parquet"
    con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT parquet)")
    n = con.execute(f"SELECT count(*) FROM '{dest}'").fetchone()[0]
    print(f"{name}: {n} rows -> {dest}", flush=True)
print("done")
