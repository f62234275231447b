#!/usr/bin/env python3
"""Local simulation of the driver's correctness gate: for every query in
oracle_sql.json, run the oracle in DuckDB over the sf parquet tables and
compare (as an unordered multiset, columns sorted by name, doubles rounded)
against the Spark-side parquet that graft.Verify wrote.

Usage: python3 tools/parity.py <sfDir> <verifyOutDir>
"""
import duckdb, json, math, sys, glob, os

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p).removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return f"{v:.6g}"
    return repr(v)

fails = 0
for name, sql in sorted(oracle.items()):
    spark_dir = f"{out}/{name}"
    if not os.path.isdir(spark_dir):
        print(f"FAIL {name}: no spark output dir"); fails += 1; continue
    try:
        odf = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    sdf = con.execute(f"SELECT * FROM '{spark_dir}/*.parquet'").fetch_arrow_table()
    ocols, scols = sorted(odf.column_names), sorted(sdf.column_names)
    if [c.lower() for c in ocols] != [c.lower() for c in scols]:
        print(f"FAIL {name}: columns differ oracle={ocols} spark={scols}"); fails += 1; continue
    orows = sorted(tuple(norm(r[c]) for c in ocols) for r in odf.to_pylist())
    srows = sorted(tuple(norm(r[c]) for c in scols) for r in sdf.to_pylist())
    if len(orows) != len(srows):
        print(f"FAIL {name}: row count oracle={len(orows)} spark={len(srows)}"); fails += 1; continue
    if orows != srows:
        bad = next(i for i, (a, b) in enumerate(zip(orows, srows)) if a != b)
        print(f"FAIL {name}: value mismatch at sorted row {bad}:\n  oracle={orows[bad]}\n  spark ={srows[bad]}")
        fails += 1; continue
    print(f"PASS {name} ({len(orows)} rows)")
print("ALL PASS" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
