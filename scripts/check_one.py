#!/usr/bin/env python3
"""check.py for a SINGLE query with a wall-clock cap (dev tooling):
runs one DuckDB oracle against one Spark output dir and prints the
same verdict line. The cap makes per-query oracle cost visible and
bounded at large SFs (see SCALE.md "sf1 oracle verification").

Usage: check_one.py <sf_dir> <out_dir> <query> [cap_seconds]
"""
import json, os, sys, threading
import duckdb
import pandas as pd

sf_dir, out_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
cap = float(sys.argv[4]) if len(sys.argv) > 4 else 600.0

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isdir(p):
        p = f"{p}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))[name]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

timer = threading.Timer(cap, con.interrupt)
timer.start()
try:
    got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
    exp = con.sql(oracle).df()
except Exception as e:
    print(f"{name}: ORACLE CAPPED/ERROR after {cap}s: {type(e).__name__}")
    sys.exit(2)
finally:
    timer.cancel()

g, e = canon(got), canon(exp)
if list(g.columns) != list(e.columns):
    print(f"{name}: SCHEMA MISMATCH {list(g.columns)} vs {list(e.columns)}")
    sys.exit(1)
if len(g) != len(e):
    print(f"{name}: ROWCOUNT MISMATCH spark={len(g)} oracle={len(e)}")
    sys.exit(1)
bad = []
for c in g.columns:
    gc, ec = g[c], e[c]
    gf = str(gc.dtype).startswith("float")
    ef = str(ec.dtype).startswith("float")
    if gf != ef:
        # dtype-class mismatch: the driver's gate hashes canonical string
        # forms, so int 123 vs float 123.0 is a hard fail there even when
        # numerically equal — mirror that here (the r13 x153/x154 lesson)
        print(f"{name}: DTYPE CLASS MISMATCH col={c} "
              f"spark={gc.dtype} oracle={ec.dtype}")
        bad.append(c)
    elif gf:
        import numpy as np
        if not np.allclose(gc.astype(float), ec.astype(float),
                           rtol=0, atol=0, equal_nan=True):
            bad.append(c)
    elif not gc.astype(str).equals(ec.astype(str)):
        bad.append(c)
if bad:
    print(f"{name}: VALUE MISMATCH cols={bad}")
    sys.exit(1)
print(f"{name}: OK ({len(g)} rows)")
