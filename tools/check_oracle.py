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

def canon_type(t):
    """Canonical Arrow type string, mirroring the driver's type-sensitive hash.

    String/binary width variants are equivalent, but numeric width/kind is NOT:
    DuckDB sum() yields int128 (HUGEINT) while Spark yields int64 — the driver
    hash-fails on that, so we must too (the old stringify-only compare hid it).
    """
    s = str(t)
    if s in ("string", "large_string", "utf8", "large_utf8"): return "str"
    if s in ("binary", "large_binary"): return "bin"
    # int widths are hash-equivalent in the driver (row_number int32 vs duck
    # int64 passed in r1), but int64 vs decimal128/HUGEINT is NOT.
    if s in ("int8", "int16", "int32", "int64", "uint8", "uint16", "uint32", "uint64"):
        return "int"
    if s.startswith("list<") or s.startswith("large_list<"):
        inner = s[s.index("<") + 1:-1]
        # strip the child field name duckdb/pyarrow disagree on ("item:"/"l:")
        inner = inner.split(": ", 1)[-1]
        return f"list<{inner}>"
    return s

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
    gtypes = {f.name: canon_type(f.type) for f in got.schema}
    wtypes = {f.name: canon_type(f.type) for f in want.schema}
    tdiff = [(c, gtypes[c], wtypes[c]) for c in gcols if gtypes[c] != wtypes[c]]
    if tdiff:
        fails.append((name, f"type mismatch (spark,duck): {tdiff}")); continue
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
