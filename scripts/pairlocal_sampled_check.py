#!/usr/bin/env python3
"""Sampled-but-exact oracle for the PAIR-LOCAL join operators (x114
containment, x2 MinHash-verified Jaccard) at SFs where the full
all-pairs DuckDB replay exceeds the cost cap (dev tooling; see
SCALE.md "sf1 oracle verification").

Both predicates are PAIR-LOCAL: whether (a,b) qualifies and its value
depend only on the two documents' gram sets, not on the rest of the
corpus. Hence two exact sub-oracles that avoid the O(n^2) corpus-wide
join:

  1. SOUNDNESS (every output row): recompute the pair metric in DuckDB
     for exactly the (doc_a, doc_b) pairs the engine emitted - each
     must qualify at the threshold with the identical value, and no
     emitted pair may be a false positive. Cost O(|output|).
  2. COMPLETENESS (deterministic pair sample): for each residue r of
     doc_id % m, replay the FULL all-pairs oracle restricted to the
     bucket {doc_id % m == r} and require set-equality with the engine
     output restricted to the same bucket. Pair-locality makes the
     restricted oracle exactly the full oracle intersected with the
     bucket's pair space, so this is an exact check of a 1/m fraction
     of all candidate pairs, chosen independently of how the engine
     prunes (no shared blocking/prefix logic with the operator).

Usage: pairlocal_sampled_check.py <sf_dir> <out_dir> [m] [residues] [query]
  m        bucket modulus (default 10)
  residues comma list (default: all of 0..m-1)
  query    x114_containment (default) | x2_dedup_minhash
"""
import os
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
m = int(sys.argv[3]) if len(sys.argv) > 3 else 10
residues = ([int(x) for x in sys.argv[4].split(",")]
            if len(sys.argv) > 4 and sys.argv[4] else list(range(m)))
query = sys.argv[5] if len(sys.argv) > 5 else "x114_containment"

# per-query pair-local metric: gram length, doc filter, the value
# expression over gram sets a/b, its output column, threshold, and the
# pair orientation predicate
SPECS = {
    "x114_containment": dict(
        n=12, t=0.9, val="containment", orient="a.doc_id <> b.doc_id",
        expr=("CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) /"
              " len(a.ng)"),
        rounded=("round(CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE)"
                 " / len(a.ng), 6)"),
        docfilter="text IS NOT NULL AND length(text) >= 12"),
    "x2_dedup_minhash": dict(
        n=5, t=0.5, val="jaccard", orient="a.doc_id < b.doc_id",
        expr=("CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) /"
              " CAST(len(a.ng) + len(b.ng) -"
              " len(list_intersect(a.ng, b.ng)) AS DOUBLE)"),
        rounded=("CAST(len(list_intersect(a.ng, b.ng)) AS DOUBLE) /"
                 " CAST(len(a.ng) + len(b.ng) -"
                 " len(list_intersect(a.ng, b.ng)) AS DOUBLE)"),
        docfilter="length(text) >= 5"),
}
S = SPECS[query]

con = duckdb.connect()
docs = f"{sf_dir}/documents.parquet"
if os.path.isdir(docs):
    docs = f"{docs}/*.parquet"
con.sql(f"""CREATE VIEW g AS
  SELECT doc_id, list_distinct(list_transform(
    generate_series(1, greatest(length(text) - {S['n'] - 1}, 0)),
    i -> substr(text, i, {S['n']}))) AS ng
  FROM '{docs}'
  WHERE {S['docfilter']}""")
con.sql(f"""CREATE VIEW got AS
  SELECT * FROM '{out_dir}/{query}/*.parquet'""")

fails = 0

# 1. soundness: recompute every emitted pair.
bad = con.sql(f"""
  SELECT count(*) FROM got
  JOIN g a ON a.doc_id = got.doc_a
  JOIN g b ON b.doc_id = got.doc_b
  WHERE {S['rounded']} <> got.{S['val']}
     OR {S['expr']} < {S['t']}""").fetchone()[0]
n_out = con.sql("SELECT count(*) FROM got").fetchone()[0]
# emitted ids must exist in the eligible-doc relation at all
orphan = con.sql("""
  SELECT count(*) FROM got
  WHERE doc_a NOT IN (SELECT doc_id FROM g)
     OR doc_b NOT IN (SELECT doc_id FROM g)""").fetchone()[0]
print(f"{query} soundness: {n_out} output pairs, {bad} value/threshold "
      f"mismatches, {orphan} orphan ids")
fails += (1 if bad or orphan else 0)

# 2. completeness: exact all-pairs replay per doc_id%m bucket.
for r in residues:
    diff = con.sql(f"""
      WITH gb AS (SELECT * FROM g WHERE doc_id % {m} = {r}),
      oracle AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               {S['rounded']} AS {S['val']}
        FROM gb a JOIN gb b ON {S['orient']}
        WHERE {S['expr']} >= {S['t']}),
      mine AS (
        SELECT doc_a, doc_b, {S['val']} FROM got
        WHERE doc_a % {m} = {r} AND doc_b % {m} = {r})
      SELECT
        (SELECT count(*) FROM oracle) AS n_oracle,
        (SELECT count(*) FROM mine) AS n_mine,
        (SELECT count(*) FROM (SELECT * FROM oracle EXCEPT
                               SELECT * FROM mine)) AS missing,
        (SELECT count(*) FROM (SELECT * FROM mine EXCEPT
                               SELECT * FROM oracle)) AS extra
      """).fetchone()
    n_o, n_m, miss, extra = diff
    ok = miss == 0 and extra == 0
    print(f"bucket %{m}=={r}: oracle={n_o} engine={n_m} "
          f"missing={miss} extra={extra} {'OK' if ok else 'FAIL'}")
    fails += (0 if ok else 1)

print(f"{query} sampled check:",
      "PASS" if fails == 0 else f"FAIL({fails})")
sys.exit(0 if fails == 0 else 1)
