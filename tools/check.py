#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables and compare (columns sorted by name, rows sorted, exact values).
Usage: check.py <sfDir> <outDir>
"""
import sys, json, math, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    qdir = f"{outdir}/{name}"
    if not glob.glob(f"{qdir}/*.parquet"):
        print(f"MISSING  {name} (no parquet written)"); fail += 1; continue
    try:
        mine = con.sql(f"SELECT * FROM '{qdir}/*.parquet'").df()
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    mine = mine.reindex(sorted(mine.columns), axis=1)
    ref = ref.reindex(sorted(ref.columns), axis=1)
    if list(mine.columns) != list(ref.columns):
        print(f"SCHEMA   {name}: mine={list(mine.columns)} ref={list(ref.columns)}")
        fail += 1; continue
    if len(mine) != len(ref):
        print(f"ROWS     {name}: mine={len(mine)} ref={len(ref)}"); fail += 1; continue
    ms = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
    rs = ref.sort_values(by=list(ref.columns)).reset_index(drop=True)
    bad = None
    for c in mine.columns:
        a, b = ms[c], rs[c]
        try:
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                d = (a - b).abs().max()
                if not (d == 0 or (isinstance(d, float) and math.isnan(d) and a.isna().equals(b.isna()))):
                    if d > 0: bad = f"col {c} max abs diff {d}"; break
            elif a.dtype == object:
                if not a.astype(str).equals(b.astype(str)):
                    bad = f"col {c} object mismatch"; break
            else:
                if not a.equals(b):
                    i = (a != b).idxmax()
                    bad = f"col {c} first diff at row {i}: {a[i]} vs {b[i]}"; break
        except Exception as e:
            bad = f"col {c} compare error: {e}"; break
    if bad: print(f"VALUE    {name}: {bad}"); fail += 1
    else: ok += 1; print(f"OK       {name}")
print(f"\n{ok} ok, {fail} failed of {len(oracle)}")
sys.exit(1 if fail else 0)
