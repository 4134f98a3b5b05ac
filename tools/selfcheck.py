#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/selfcheck.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (written by graft.Verify) and outDir/oracle_sql.json,
runs each oracle SQL in DuckDB against the sfDir tables, and compares:
columns sorted by name, rows sorted, exact value match (floats: exact bits,
falling back to rel-tol 1e-12 report).
"""
import sys, json, glob, math
import duckdb

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
# explicit cap + spill dir: the 80%-of-RAM default OOMs when a just-exited
# Spark JVM's memory hasn't been returned yet (sf1-sized oracle runs).
# Overridable (SELFCHECK_MEM): the p24/p32 oracles need >48GB at sf1 —
# their recursive-CTE/list operators cannot spill — and on an idle machine
# a bigger cap is available.
import os
con.execute(f"SET memory_limit='{os.environ.get('SELFCHECK_MEM', '48GB')}'")
con.execute("SET temp_directory='/tmp/duck_spill'")
only = os.environ.get("SELFCHECK_ONLY")  # comma-separated query-name filter
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
relnotes = {}
for name, sql in sorted(oracle.items()):
    if only and name not in only.split(","):
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetchdf()
    exp = exp[sorted(exp.columns)]; got = got[sorted(got.columns)]
    if list(exp.columns) != list(got.columns):
        print(f"FAIL {name}: cols exp={list(exp.columns)} got={list(got.columns)}"); fails += 1; continue
    if len(exp) != len(got):
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}"); fails += 1; continue
    exp = exp.sort_values(list(exp.columns)).reset_index(drop=True)
    got = got.sort_values(list(got.columns)).reset_index(drop=True)
    bad = []
    for c in exp.columns:
        ev, gv = exp[c].tolist(), got[c].tolist()
        for i, (a, b) in enumerate(zip(ev, gv)):
            if a is None and b is None: continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b and not (math.isnan(a) and math.isnan(b)):
                    rel = abs(a-b)/max(abs(a),abs(b),1e-300)
                    # summation-order noise is not a mismatch: at sf1 a
                    # 6M-row double sum differs in the last ulp between any
                    # two engines; report it, fail only beyond 1e-12
                    if rel > 1e-12:
                        bad.append((c, i, a, b, f"rel={rel:.2e}"))
                    elif name not in relnotes:
                        relnotes[name] = f"{c}[{i}] rel={rel:.2e}"
            elif str(a) != str(b):
                bad.append((c, i, a, b, "neq"))
    if bad:
        print(f"FAIL {name}: {len(bad)} mismatches, first: {bad[:3]}"); fails += 1
    else:
        note = f" [float ulp noise: {relnotes[name]}]" if name in relnotes else ""
        print(f"PASS {name} ({len(exp)} rows, {len(exp.columns)} cols){note}")
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'} / {len(oracle)} queries")
sys.exit(1 if fails else 0)
