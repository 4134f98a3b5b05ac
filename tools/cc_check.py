#!/usr/bin/env python3
"""p24 (dedup clusters) oracle for big SFs (driver-side tool).

The p24 SQL oracle closes connected components with a recursive CTE that
materializes every (node, reachable-node) pair — quadratic in component
size. At sf1 the scale-up's 10 salted near-dup copies per document make
every cluster a 10-clique and DuckDB 1.0 runs out of memory (no USING KEY
recursive CTEs yet). This checker keeps the oracle property but swaps the
closure: DuckDB still computes the candidate→verified→threshold PAIRS
(the part that must mirror the Spark pipeline bit-for-bit), and a Python
union-find with min-id representatives does the closure in linear memory.

Usage: python3 tools/cc_check.py <sfDir> <verifyOutDir>
Exit 0 on match with <verifyOutDir>/p24_dedup_clusters parquet.
"""
import sys, json, glob
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]

sql = json.load(open(f"{outdir}/oracle_sql.json"))["p24_dedup_clusters"]
cut = sql.find("sym AS")
assert cut > 0, "p24 oracle shape changed; update cc_check.py"
pairs_sql = sql[:cut].rstrip().rstrip(",") + "\nSELECT id_a, id_b FROM pairs"

con = duckdb.connect()
con.execute("SET memory_limit='48GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")
for t in ["documents"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

pairs = con.execute(pairs_sql).fetchall()
doc_ids = [r[0] for r in con.execute(
    f"SELECT doc_id FROM '{sfdir}/documents.parquet'").fetchall()]

parent = {}
def find(x):
    r = x
    while parent.get(r, r) != r:
        r = parent[r]
    while parent.get(x, x) != x:
        parent[x], x = r, parent[x]
    return r
def union(a, b):
    ra, rb = find(a), find(b)
    if ra != rb:
        # min-id wins so representatives match the SQL oracle's MIN(x)
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        parent[hi] = lo

for a, b in pairs:
    union(a, b)

assign = {d: find(d) for d in doc_ids}
sizes = {}
for c in assign.values():
    sizes[c] = sizes.get(c, 0) + 1
expected = {d: (assign[d], sizes[assign[d]]) for d in doc_ids}

files = glob.glob(f"{outdir}/p24_dedup_clusters/*.parquet")
got = con.execute(f"SELECT doc_id, cluster_id, cluster_size FROM read_parquet({files!r})").fetchall()

bad = 0
if len(got) != len(expected):
    print(f"FAIL rows: spark={len(got)} expected={len(expected)}"); bad += 1
for d, c, s in got:
    e = expected.get(d)
    if e != (c, s):
        if bad < 5:
            print(f"FAIL doc {d}: spark=({c},{s}) expected={e}")
        bad += 1
print(f"{'PASS' if bad == 0 else f'FAIL ({bad} mismatches)'} p24_dedup_clusters "
      f"({len(got)} rows, {len(pairs)} pairs, {len(set(assign.values()))} clusters)")
sys.exit(1 if bad else 0)
