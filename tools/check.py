#!/usr/bin/env python3
"""Local replica of the driver's correctness gate, driver-faithful edition.

The driver (r02 traceback evidence) reads OUR parquet via pandas, runs the
oracle SQL via DuckDB .df(), sorts both frames with sort_values over the
name-sorted columns, then hash-compares values. Consequences we must
replicate locally:
  - list/array cells crash its sort ("unhashable type: numpy.ndarray")
  - DuckDB HUGEINT (bare integer sum()) becomes float64 -> dtype/hash
    mismatch vs our int64
  - DuckDB TIMESTAMPTZ (to_timestamp) vs Spark parquet timestamps differ
    in unit/tz -> schema mismatch
So: pandas on both sides, strict dtype check, exact value compare.
Usage: check.py <sfDir> <outDir> [only...]
"""
import sys, json, glob, os
import duckdb
import numpy as np
import pandas as pd

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
    files = glob.glob(f"{qdir}/*.parquet")
    if not files:
        print(f"MISSING  {name} (no parquet written)"); fail += 1; continue
    try:
        mine = pd.concat([pd.read_parquet(f) for f in sorted(files)],
                         ignore_index=True)
        ref = con.sql(sql).df()
        if sorted(mine.columns) != sorted(ref.columns):
            print(f"SCHEMA   {name}: mine={sorted(mine.columns)} "
                  f"ref={sorted(ref.columns)}"); fail += 1; continue
        cols = sorted(mine.columns)
        mine, ref = mine[cols], ref[cols]
        dt_bad = [(c, str(mine[c].dtype), str(ref[c].dtype))
                  for c in cols if mine[c].dtype != ref[c].dtype]
        if dt_bad:
            print(f"DTYPE    {name}: {dt_bad}"); fail += 1; continue
        if len(mine) != len(ref):
            print(f"ROWS     {name}: mine={len(mine)} ref={len(ref)}")
            fail += 1; continue
        # driver-style sort: crashes here if any cell is a list/ndarray
        mine = mine.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        ref = ref.sort_values(by=cols, kind="mergesort").reset_index(drop=True)
        bad = None
        for c in cols:
            a, b = mine[c].to_numpy(), ref[c].to_numpy()
            if a.dtype.kind == "f":
                eq = (a == b) | (np.isnan(a) & np.isnan(b))
            else:
                eq = (a == b)
            if not eq.all():
                i = int(np.argmin(eq))
                bad = f"col={c} row={i} mine={a[i]!r} ref={b[i]!r}"
                break
        if bad:
            print(f"VALUE    {name}: {bad}"); fail += 1; continue
        ok += 1; print(f"OK       {name}")
    except Exception as e:
        print(f"ERROR    {name}: {type(e).__name__}: {e}"); fail += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
