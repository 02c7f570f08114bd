#!/usr/bin/env python3
"""sf1 correctness via the shard law (dev tooling).

The synthetic sf1 is ScaleGen's ten id-shifted shards of sf0.1: shard 0
is VERBATIM sf0.1 (ids and text unchanged), shards k>0 shift ids by
k*1e9 and splice "~k" mid-token so cross-shard exact/near-dup structure
collapses by construction. For operators whose output decomposes per
shard this yields a checkable law wherever the full DuckDB oracle
replay is past the cost cap:

  1. SHARD-0 FAITHFULNESS - the sf1 output restricted to shard-0 ids
     must equal the (oracle-verified) sf0.1 output row-for-row: the
     other nine shards must not perturb shard 0's result.
  2. EXACT 10x ROWS - ten structurally-identical shards produce exactly
     ten times the sf0.1 row count (asserted, not just printed).
  3. CROSS-SHARD LEAKS - output rows pairing ids from two different
     shards must not exist (the splice collapses cross-shard
     similarity). NO exclusion is applied for degenerate empty/
     whitespace docs: such docs receive no splice (nothing to splice
     into) and would legitimately pair across shards, so a generator
     emitting cross-shard-pairable degenerates would surface here as a
     FAIL - by construction of the current ScaleGen fixtures none
     exist (leak count is 0 in every recorded run), and keeping the
     check unconditional means a fixture regression is caught instead
     of filtered away.

Together with the DuckDB oracle check run at sf0.1 itself
(check.py /root/testdata/sf0.1 <out>), this lifts oracle-grade
verification to the sf1 decade: oracle => sf0.1 correct;
shard law => sf1 behaves as ten independent verified shards.

x63 pagerank is NOT in the table, by measurement as well as by
construction: its edge set is simhashPairs, and simhash fingerprints
are hashes OF the tokens - the splice rewrites every token, so a
within-shard pair's hamming distance differs from shard 0's and the
shard-k graphs are legitimately different (measured: sf1 has 12,461
pagerank nodes vs 10 x 947). Contrast x2 MinHash, where candidates
pass an exact-Jaccard VERIFY that the splice preserves pair-locally,
so its output obeys the law. x63 takes the DIRECT DuckDB oracle at
sf1 instead (the poly-simhash variant is exactly replayable; OK at
12,461 rows) - strictly stronger than the law it cannot use.

Usage: sf1_shard_check.py <sf1_out_dir> <sf01_out_dir> <query> [query...]
"""
import sys
import duckdb

SHIFT = 10 ** 9

# per-query id columns: (single-id cols, pair cols).
# NOTE the law applies to operators whose output decomposes per shard
# (dedup/similarity: the splice guarantees cross-shard independence;
# keyed temporal operators: surrogate keys shift per shard, timestamps
# and values are unchanged, so each shard's sessions/runs/lookups
# mirror shard 0's). It does NOT apply to global-neighborhood
# operators like x6 ANN -- at sf1 the corpus holds all ten shards, so
# the true top-k/kth_cosine legitimately differs from sf0.1 (perturbed
# shard vectors enter the neighborhood); x6 takes the DIRECT DuckDB
# oracle at sf1 instead (exact brute-force top-k is cheap SQL even at
# 2M vectors).
ID_COLS = {
    "x1_dedup_exact": (["keep_id"], []),
    "x2_dedup_minhash": ([], [("doc_a", "doc_b")]),
    "x85_span_dedup": (["doc_id"], []),
    "x112_span_dedup_all": (["doc_id"], []),
    "x114_containment": ([], [("doc_a", "doc_b")]),
    # round-10 extension: temporal/keyed heads (sf1 keys shift by
    # k*1e9, timestamps/values verbatim per shard)
    "x14_asof_prev_order": (["o_orderkey"], []),
    "x109_asof_next_order": (["o_orderkey"], []),
    "x23_sessionize": (["user_id"], []),
    "x93_scd2_merge": (["key"], []),
}

# queries with a global-normalization VALUE transform on the shard-0
# compare: id col, value col, shard-0 scale factor, abs tolerance.
# (Empty since x63 was measured shard-law-inapplicable - see module
# docstring - but the mechanism stays for future global-normalized
# per-shard-decomposable outputs.)
SCALED_COLS = {}

# Queries MEASURED shard-law-inapplicable, each with the reason and its
# stronger substitute (formalizing the round-15 prose exemptions in the
# tooling): asking for one of these prints the exemption instead of a
# bogus FAIL. Every entry is covered by a DIRECT DuckDB oracle at sf1
# (recorded in SCALE.md), which is strictly stronger than the law.
EXEMPT = {
    "x63_pagerank":
        "simhash fingerprints hash the TOKENS; the shard splice "
        "rewrites every token, so shard-k edge sets legitimately "
        "differ from shard 0 (measured: 12,461 nodes vs 10 x 947). "
        "Direct sf1 oracle instead.",
    "x6_ann_lsh":
        "global-neighborhood operator: at sf1 all ten shards share "
        "one corpus, so true top-k legitimately differs from sf0.1. "
        "Direct sf1 oracle instead.",
    "x162_media_near_dedup":
        "the 16-point byte-sample features ignore all but 16 payload "
        "offsets; the splice preserves sampled bytes for ~1/16 of "
        "spliced copies, so >=0.999-cosine CROSS-SHARD pairs "
        "legitimately exist (measured r15; all oracle-confirmed). "
        "Direct sf1 oracle instead.",
    "x163_media_dedup_delta":
        "same feature family as x162 (sampled-byte coincidences "
        "survive the splice cross-shard). Direct sf1 oracle instead.",
    "x164_media_frame_overlap":
        "same feature family at frame granularity: frame keys are 16 "
        "sampled bytes per 256-byte window, so spliced copies keep "
        "most frame keys intact and cross-shard frame matches "
        "legitimately exist. Direct sf1 oracle instead.",
    "x165_media_frame_delta":
        "x164's delta route - same frame-key family, same measured "
        "cross-shard coincidences. Direct sf1 oracle instead.",
    "x166_cross_modal_components":
        "media edges use x162's sampled-byte features (cross-shard "
        "coincidences survive the splice) and clusters span shards "
        "through them. Direct sf1 oracle instead (44,163 rows green).",
}

sf1_dir, sf01_dir = sys.argv[1], sys.argv[2]
queries = sys.argv[3:] or list(ID_COLS)

con = duckdb.connect()
fails = 0
for q in queries:
    if q in EXEMPT:
        print(f"{q}: EXEMPT (shard law inapplicable - {EXEMPT[q]})")
        continue
    hi = f"'{sf1_dir}/{q}/*.parquet'"
    lo = f"'{sf01_dir}/{q}/*.parquet'"
    n_hi = con.sql(f"SELECT count(*) FROM {hi}").fetchone()[0]
    n_lo = con.sql(f"SELECT count(*) FROM {lo}").fetchone()[0]
    if q in SCALED_COLS:
        idc, valc, scale, tol = SCALED_COLS[q]
        bad = con.sql(
            f"SELECT count(*) FROM {hi} h JOIN {lo} l USING ({idc}) "
            f"WHERE h.{idc} < {SHIFT} "
            f"AND abs(h.{valc} * {scale} - l.{valc}) > {tol}").fetchone()[0]
        matched = con.sql(
            f"SELECT count(*) FROM {hi} h JOIN {lo} l USING ({idc}) "
            f"WHERE h.{idc} < {SHIFT}").fetchone()[0]
        shard0 = con.sql(
            f"SELECT count(*) FROM {hi} WHERE {idc} < {SHIFT}").fetchone()[0]
        ok = (bad == 0 and matched == n_lo and shard0 == n_lo
              and n_hi == 10 * n_lo)
        if not ok:
            fails += 1
        print(f"{q}: {'OK' if ok else 'FAIL'} "
              f"(sf1 rows={n_hi}, sf0.1 rows={n_lo}, shard0={shard0}, "
              f"joined={matched}, out-of-tol={bad}, "
              f"scaled x{scale} tol={tol}, 10x={'yes' if n_hi == 10 * n_lo else 'NO'})")
        continue
    singles, pairs = ID_COLS[q]
    # 1. shard-0 restriction of the sf1 output == the sf0.1 output.
    # All id columns < SHIFT selects shard 0; non-id columns (text,
    # scores, counts) must match byte-for-byte since shard 0 is
    # verbatim.
    cond = " AND ".join(
        [f"{c} < {SHIFT}" for c in singles] +
        [f"{a} < {SHIFT} AND {b} < {SHIFT}" for a, b in pairs]) or "true"
    only_hi = con.sql(
        f"SELECT count(*) FROM (SELECT * FROM {hi} WHERE {cond} "
        f"EXCEPT ALL SELECT * FROM {lo})").fetchone()[0]
    only_lo = con.sql(
        f"SELECT count(*) FROM (SELECT * FROM {lo} "
        f"EXCEPT ALL SELECT * FROM {hi} WHERE {cond})").fetchone()[0]
    # 2. cross-shard leaks in pair outputs (unconditional; see module
    # docstring)
    leaks = 0
    for a, b in pairs:
        leaks += con.sql(
            f"SELECT count(*) FROM {hi} "
            f"WHERE ({a} // {SHIFT}) <> ({b} // {SHIFT})").fetchone()[0]
    ok = (only_hi == 0 and only_lo == 0 and leaks == 0
          and n_hi == 10 * n_lo)
    if not ok:
        fails += 1
    print(f"{q}: {'OK' if ok else 'FAIL'} "
          f"(sf1 rows={n_hi}, sf0.1 rows={n_lo}, "
          f"shard0-extra={only_hi}, shard0-missing={only_lo}, "
          f"cross-shard-leaks={leaks}, "
          f"10x={'yes' if n_hi == 10 * n_lo else 'NO'})")
print("ALL OK" if fails == 0 else f"{fails} FAILED")
sys.exit(1 if fails else 0)
