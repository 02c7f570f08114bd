package graft

import org.apache.spark.sql.functions.{col, lit}

import graft.operators.SpanDedup

/** Token-level exact-substring dedup with span removal (x85). The fixture
  * geometry exercises every branch: cross-doc duplicated run (canonical
  * stays), within-doc repeat, overlapping spans that must interval-merge,
  * adjacent spans that must fuse, a doc shorter than the window, and an
  * untouched doc (must be absent from the output).
  */
class SpanDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("cross-doc duplicated run: first (doc_id, pos) occurrence survives, " +
    "later docs lose exactly the run") {
    val shared = toks("dup", 6) // 6 shared tokens, window L=4
    val docs = Seq(
      (1L, s"${toks("a", 3)} $shared ${toks("b", 3)}"),
      (2L, s"${toks("c", 5)} $shared ${toks("d", 2)}"),
      (3L, toks("solo", 8))
    ).toDF("doc_id", "text")
    val got = SpanDedup.excise(docs, windowTokens = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // only doc 2 is modified: doc 1 holds the canonical occurrence
    assert(got.keySet === Set(2L))
    val (n, removed, clean) = (got(2L)._1, got(2L)._2, got(2L)._3)
    assert(n === 13L && removed === 6L)
    assert(clean === s"${toks("c", 5)} ${toks("d", 2)}")
  }

  test("exciseAll: every doc surfaces — modified docs rewritten, " +
    "untouched docs keep their text with n_removed = 0, null text " +
    "passes through") {
    val shared = toks("dup", 6)
    val docs = Seq(
      (1L, s"${toks("a", 3)} $shared ${toks("b", 3)}"),
      (2L, s"${toks("c", 5)} $shared ${toks("d", 2)}"),
      (3L, toks("solo", 8)),
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = SpanDedup.exciseAll(docs, windowTokens = 4)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) null else r.getString(3)))).toMap
    assert(got.keySet === Set(1L, 2L, 3L, 4L))
    // doc 2 rewritten exactly as excise() rewrites it
    assert(got(2L) === ((13L, 6L, s"${toks("c", 5)} ${toks("d", 2)}")))
    // canonical and untouched docs pass through unmodified
    assert(got(1L) === ((12L, 0L, s"${toks("a", 3)} $shared ${toks("b", 3)}")))
    assert(got(3L) === ((8L, 0L, toks("solo", 8))))
    assert(got(4L) === ((0L, 0L, null)))
  }

  test("within-doc repeat excises the second occurrence only") {
    val run = toks("r", 5)
    val docs = Seq(
      (1L, s"$run ${toks("mid", 4)} $run")
    ).toDF("doc_id", "text")
    val got = SpanDedup.excise(docs, windowTokens = 5)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length === 1)
    assert(got(0)._3 === 5L)
    assert(got(0)._4 === s"$run ${toks("mid", 4)}")
  }

  test("overlapping duplicated windows merge into one span (a run of R " +
    "tokens produces R-L+1 windows, removed once, not R-L+1 times)") {
    val run = toks("z", 9) // 9-token run, L=4 -> 6 overlapping windows
    val docs = Seq(
      (1L, s"$run ${toks("x", 4)}"),
      (2L, s"${toks("y", 4)} $run")
    ).toDF("doc_id", "text")
    val got = SpanDedup.excise(docs, windowTokens = 4)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length === 1 && got(0)._1 === 2L)
    assert(got(0)._3 === 9L) // merged: exactly the run, once
    assert(got(0)._4 === toks("y", 4))
  }

  test("documents shorter than the window never match; untouched docs are " +
    "absent; empty rewrite allowed when the whole doc is duplicated") {
    val run = toks("w", 6)
    val docs = Seq(
      (1L, s"${toks("p", 2)} $run"), // canonical holder
      (2L, run),                     // fully duplicated -> empty rewrite
      (3L, toks("w", 3)),            // shorter than L=6: no windows
      (4L, toks("q", 10))            // untouched
    ).toDF("doc_id", "text")
    val got = SpanDedup.excise(docs, windowTokens = 6)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got.keySet === Set(2L))
    assert(got(2L)._2 === 6L && got(2L)._3 === 6L && got(2L)._4 === "")
  }

  test("periodic text: per-window Lee-et-al semantics erode the canonical " +
    "run (documented degenerate case — survivor may be shorter than L)") {
    // 8 identical tokens, L=4: windows at pos 1..5 all share one fp; pos 1
    // is canonical, pos 2..5 merge to span [2,8] -> only token 1 survives
    val docs = Seq((1L, Array.fill(8)("t").mkString(" ")))
      .toDF("doc_id", "text")
    val got = SpanDedup.excise(docs, windowTokens = 4)
      .as[(Long, Long, Long, String)].collect()
    assert(got.length === 1)
    assert(got(0)._2 === 8L && got(0)._3 === 7L && got(0)._4 === "t")
  }

  test("invalid window size rejected") {
    val docs = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SpanDedup.excise(docs, windowTokens = 1)
    }
    intercept[IllegalArgumentException] {
      SpanDedup.fpIndex(docs, windowTokens = 1)
    }
    intercept[IllegalArgumentException] {
      SpanDedup.exciseDelta(docs, docs.select(lit(1L).as("fp")),
        windowTokens = 0)
    }
  }

  test("delta: first-arrival semantics — the corpus occurrence wins even " +
    "when the delta doc has the smaller id") {
    val run = toks("dup", 5)
    // corpus doc 100 holds the run; delta doc 1 duplicates it. An
    // id-ordered recompute would keep doc 1's copy — first-arrival must
    // excise it from the delta instead and never touch the corpus.
    val corpus = Seq((100L, s"${toks("c", 3)} $run")).toDF("doc_id", "text")
    val delta = Seq(
      (1L, s"$run ${toks("d", 3)}"),
      (2L, toks("fresh", 9))
    ).toDF("doc_id", "text")
    val got = SpanDedup.exciseDelta(delta,
      SpanDedup.fpIndex(corpus, windowTokens = 5), windowTokens = 5)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet === Set(1L))
    assert(got(1L) === ((8L, 5L, toks("d", 3))))
  }

  test("delta: fingerprints new to the batch dedup among themselves by " +
    "(doc_id, pos); parquet round-trip of the index changes nothing") {
    val run = toks("z", 6)
    val corpus = Seq((50L, toks("old", 10))).toDF("doc_id", "text")
    val delta = Seq(
      (7L, s"${toks("a", 2)} $run"),  // canonical holder among the delta
      (14L, s"$run ${toks("b", 2)}")
    ).toDF("doc_id", "text")
    val dir =
      s"${java.nio.file.Files.createTempDirectory("span-fp-index-")}/idx"
    SpanDedup.fpIndex(corpus, windowTokens = 6).write.parquet(dir)
    val got = SpanDedup.exciseDelta(delta, spark.read.parquet(dir),
      windowTokens = 6)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.keySet === Set(14L))
    assert(got(14L) === ((8L, 6L, toks("b", 2))))
  }

  test("delta equals full arrival-ordered excision restricted to the " +
    "batch (emulated by offsetting delta ids past the corpus)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    // delta = doc_id % 7 == 0, re-keyed to +10_000_000 so that plain
    // id-ordered excise() on the union IS arrival order
    val corpus = docs.filter(col("doc_id") % 7 =!= 0)
    val delta0 = docs.filter(col("doc_id") % 7 === 0)
    val delta = delta0.withColumn("doc_id", col("doc_id") + 10000000L)
    val got = SpanDedup.exciseDelta(delta,
      SpanDedup.fpIndex(corpus, windowTokens = 10), windowTokens = 10)
      .as[(Long, Long, Long, String)].collect().toSet
    val full = SpanDedup.excise(corpus.unionByName(delta),
      windowTokens = 10)
      .as[(Long, Long, Long, String)].collect().toSet
      .filter(_._1 >= 10000000L)
    assert(got === full)
    assert(got.nonEmpty, "fixture must plant cross-batch duplicate runs")
  }
}
