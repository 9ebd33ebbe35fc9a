#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
parquet written by graft.Verify, run the oracle SQL in DuckDB over the same
sf tables and compare via symmetric EXCEPT ALL (handles list columns,
exact float equality). Usage: check.py <sfDir> <outDir> [only...]
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    qdir = f"{outdir}/{name}"
    if not glob.glob(f"{qdir}/*.parquet"):
        print(f"MISSING  {name} (no parquet written)"); fail += 1; continue
    try:
        con.execute("CREATE OR REPLACE VIEW mine_raw AS "
                    f"SELECT * FROM '{qdir}/*.parquet'")
        con.execute(f"CREATE OR REPLACE VIEW ref_raw AS {sql}")
        mcols = [r[0] for r in con.sql("DESCRIBE mine_raw").fetchall()]
        rcols = [r[0] for r in con.sql("DESCRIBE ref_raw").fetchall()]
        if sorted(mcols) != sorted(rcols):
            print(f"SCHEMA   {name}: mine={sorted(mcols)} ref={sorted(rcols)}")
            fail += 1; continue
        cols = ", ".join(f'"{c}"' for c in sorted(mcols))
        nm = con.sql("SELECT count(*) FROM mine_raw").fetchone()[0]
        nr = con.sql("SELECT count(*) FROM ref_raw").fetchone()[0]
        if nm != nr:
            print(f"ROWS     {name}: mine={nm} ref={nr}"); fail += 1; continue
        d1 = con.sql(f"SELECT {cols} FROM mine_raw EXCEPT ALL SELECT {cols} FROM ref_raw").fetchmany(3)
        d2 = con.sql(f"SELECT {cols} FROM ref_raw EXCEPT ALL SELECT {cols} FROM mine_raw").fetchmany(3)
        if d1 or d2:
            print(f"VALUE    {name}: mine-only={d1[:1]} ref-only={d2[:1]}")
            fail += 1; continue
        ok += 1; print(f"OK       {name}")
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
