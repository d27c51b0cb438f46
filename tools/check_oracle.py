#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify at a
scale factor, then execute each oracle SQL in DuckDB over the same parquet
tables and compare row/schema/values (columns sorted by name, rows sorted).

Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import sys, os, json, glob, math
import duckdb
import pyarrow.parquet as pq

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        return repr(v)
    return str(v)

fails, passes = [], []
for name, sql in sorted(oracle.items()):
    rdir = f"{outdir}/{name}"
    if not os.path.isdir(rdir):
        fails.append((name, "NO SPARK OUTPUT")); continue
    try:
        got = pq.read_table(rdir)
    except Exception as e:
        fails.append((name, f"read error: {e}")); continue
    try:
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        fails.append((name, f"oracle error: {e}")); continue
    gcols = sorted(got.column_names); wcols = sorted(want.column_names)
    if gcols != wcols:
        fails.append((name, f"schema mismatch: spark={gcols} duck={wcols}")); continue
    grows = sorted([tuple(norm(r[c]) for c in gcols) for r in got.to_pylist()])
    wrows = sorted([tuple(norm(r[c]) for c in wcols) for r in want.to_pylist()])
    if len(grows) != len(wrows):
        fails.append((name, f"row count: spark={len(grows)} duck={len(wrows)}")); continue
    if grows != wrows:
        diffs = [(g, w) for g, w in zip(grows, wrows) if g != w][:3]
        fails.append((name, f"value mismatch, first diffs: {diffs}")); continue
    passes.append((name, len(grows)))

for n, c in passes: print(f"PASS {n} ({c} rows)")
for n, m in fails: print(f"FAIL {n}: {m}")
print(f"\n{len(passes)} passed, {len(fails)} failed")
sys.exit(1 if fails else 0)
