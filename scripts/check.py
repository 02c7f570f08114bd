#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify output
against DuckDB oracles and compare (sorted columns, sorted rows, hashed
values). Dev tooling only — the engine itself is Scala."""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    # driver testdata ships single files; ScaleGen's synthetic SFs are
    # Spark directory-parquets — glob those
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

fails = 0
for name in sorted(oracle):
    path = f"{out_dir}/{name}"
    if not os.path.isdir(path):
        print(f"{name}: MISSING spark output"); fails += 1; continue
    got = con.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {e}"); fails += 1; continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"{name}: SCHEMA MISMATCH spark={list(g.columns)} oracle={list(e.columns)}")
        fails += 1; continue
    if len(g) != len(e):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(g)} oracle={len(e)}")
        fails += 1; continue
    eq = True
    for c in g.columns:
        gc, ec = g[c], e[c]
        gf = str(gc.dtype).startswith("float")
        ef = str(ec.dtype).startswith("float")
        if gf != ef:
            # dtype-class mismatch: the driver's gate hashes canonical
            # string forms, so int 123 vs float 123.0 is a hard fail there
            # even when numerically equal (the r13 x153/x154 lesson)
            print(f"{name}: DTYPE CLASS MISMATCH col={c} spark={gc.dtype} oracle={ec.dtype}")
            eq = False
        elif gf:
            import numpy as np
            if not np.allclose(gc.astype(float), ec.astype(float), rtol=0, atol=0, equal_nan=True):
                # exact compare — report max diff
                d = (gc.astype(float) - ec.astype(float)).abs().max()
                print(f"{name}: FLOAT MISMATCH col={c} maxdiff={d}")
                eq = False
        else:
            if not gc.astype(str).equals(ec.astype(str)):
                bad = (gc.astype(str) != ec.astype(str))
                i = bad.idxmax()
                print(f"{name}: VALUE MISMATCH col={c} row{i}: spark={gc[i]!r} oracle={ec[i]!r}")
                eq = False
    if eq:
        print(f"{name}: OK ({len(g)} rows)")
    else:
        fails += 1
sys.exit(1 if fails else 0)
