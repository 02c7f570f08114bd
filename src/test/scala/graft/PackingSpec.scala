package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def greedy(rows: Seq[(String, Long, Long)], budget: Long) =
    Packing.packGreedy(rows.toDF("src", "id", "toks"),
      col("src"), "id", col("toks"), budget)
      .as[(String, Long, Long, Long, Long)].collect().toSet

  test("greedy: boundaries, oversize isolation, empty docs") {
    // budget 10: [4,5] fit (9), 3 opens seq 1, 12 is oversize and alone,
    // the doc after an oversize starts fresh, empties stack, and 8 then
    // fills seq 3 to exactly the budget (2+8 = 10 fits)
    val got = greedy(Seq(
      ("a", 1L, 4L), ("a", 2L, 5L), ("a", 3L, 3L), ("a", 4L, 12L),
      ("a", 5L, 2L), ("a", 6L, 0L), ("a", 7L, 0L), ("a", 8L, 8L)), 10L)
    assert(got === Set(
      ("a", 1L, 0L, 0L, 4L), ("a", 2L, 0L, 4L, 5L),
      ("a", 3L, 1L, 0L, 3L),
      ("a", 4L, 2L, 0L, 12L),
      ("a", 5L, 3L, 0L, 2L), ("a", 6L, 3L, 2L, 0L), ("a", 7L, 3L, 2L, 0L),
      ("a", 8L, 3L, 2L, 8L)))
  }

  test("greedy: shards pack independently; null ids drop, null toks = 0") {
    val df = Seq[(String, Option[Long], Option[Long])](
      ("a", Some(1L), Some(6L)), ("a", Some(2L), Some(6L)),
      ("b", Some(1L), Some(6L)), ("b", Some(2L), None),
      ("b", None, Some(9L))).toDF("src", "id", "toks")
    val got = Packing.packGreedy(df, col("src"), "id", col("toks"), 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 1L, 0L, 0L, 6L), ("a", 2L, 1L, 0L, 6L),
      ("b", 1L, 0L, 0L, 6L), ("b", 2L, 0L, 6L, 0L)))
  }

  test("concat: spans, offsets, slice conservation") {
    // budget 10, one shard: 4 | 8 spans seqs 0+1 (6+2) | 0-token at 12 |
    // 25 spans seqs 1,2,3 (8+10+7)
    val got = Packing.packConcat(
      Seq(("a", 1L, 4L), ("a", 2L, 8L), ("a", 3L, 0L), ("a", 4L, 25L))
        .toDF("src", "id", "toks"), col("src"), "id", col("toks"), 10L)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === Set(
      ("a", 1L, 0L, 0L, 4L),
      ("a", 2L, 0L, 4L, 6L), ("a", 2L, 1L, 0L, 2L),
      ("a", 3L, 1L, 2L, 0L),
      ("a", 4L, 1L, 2L, 8L), ("a", 4L, 2L, 0L, 10L), ("a", 4L, 3L, 0L, 7L)))
  }

  test("randomized: greedy matches a driver-side reference; concat conserves") {
    val rnd = new scala.util.Random(20260813L)
    val budget = 50L
    val rows = (1L to 400L).map { i =>
      (s"s${i % 7}", i, rnd.nextInt(70).toLong) // includes oversize > 50
    }
    // driver-side greedy reference
    val want = rows.groupBy(_._1).toSeq.flatMap { case (src, ds) =>
      var seq = -1L; var fill = 0L
      ds.sortBy(_._2).map { case (_, id, toks) =>
        if (seq < 0 || fill + toks > budget) { seq += 1; fill = 0L }
        val off = fill; fill += toks
        (src, id, seq, off, toks)
      }
    }.toSet
    // input partitioning must not affect the result
    val shuffled = rnd.shuffle(rows).toDF("src", "id", "toks").repartition(13)
    val got = Packing.packGreedy(shuffled, col("src"), "id", col("toks"), budget)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === want)

    val concat = Packing.packConcat(shuffled, col("src"), "id", col("toks"), budget)
      .as[(String, Long, Long, Long, Long)].collect()
    // per-doc slice totals reconstruct the token counts
    val totals = concat.groupBy(c => (c._1, c._2)).view
      .mapValues(_.map(_._5).sum).toMap
    assert(totals === rows.map(r => ((r._1, r._2), r._3)).toMap)
    // every slice sits inside its sequence, and non-final slices of a
    // doc run to the sequence boundary (slices are contiguous)
    concat.foreach { case (src, id, seq, off, n) =>
      assert(off >= 0 && off + n <= budget, s"($src,$id,$seq)")
    }
    // sequences never overflow and only the concat tail runs short
    val bySeq = concat.groupBy(c => (c._1, c._3)).view
      .mapValues(_.map(_._5).sum).toMap
    bySeq.foreach { case ((src, seq), fill) =>
      assert(fill <= budget, s"($src,$seq) overflows: $fill")
      val lastSeq = bySeq.keys.filter(_._1 == src).map(_._2).max
      if (seq != lastSeq) assert(fill == budget, s"($src,$seq) underfull: $fill")
    }
  }

  test("subShards: greedy matches per-sub-shard reference, dense seq_idx") {
    val rnd = new scala.util.Random(42L)
    val budget = 50L
    val n = 4
    val rows = (1L to 300L).map(i => (s"s${i % 3}", i, rnd.nextInt(70).toLong))
    val df = rnd.shuffle(rows).toDF("src", "id", "toks").repartition(11)
    // sub assignment replayed through the same public hash the operator uses
    val sub = df.select(col("id"),
        floor(graft.operators.Corpus.hashUnit(col("id")) * n).cast("int").as("s"))
      .as[(Long, Int)].collect().toMap
    assert(sub.values.toSet.size > 1, "hash should spread over sub-shards")
    // driver-side reference: pack each (shard, sub) in id order, then
    // offset seq_idx by the sequence counts of earlier sub-shards
    val bySub = rows.groupBy(r => (r._1, sub(r._2))).view.mapValues { ds =>
      var seq = -1L; var fill = 0L
      ds.sortBy(_._2).map { case (src, id, toks) =>
        if (seq < 0 || fill + toks > budget) { seq += 1; fill = 0L }
        val off = fill; fill += toks
        (src, id, seq, off, toks)
      }
    }.toMap
    val want = bySub.flatMap { case ((src, s), packed) =>
      val offset = bySub.collect {
        case ((src2, s2), p) if src2 == src && s2 < s => p.map(_._3).max + 1
      }.sum
      packed.map(p => p.copy(_3 = p._3 + offset))
    }.toSet
    val got = Packing.packGreedy(df, col("src"), "id", col("toks"), budget, n)
      .as[(String, Long, Long, Long, Long)].collect().toSet
    assert(got === want)
    // dense per-shard indices: 0..max all present
    got.groupBy(_._1).foreach { case (src, ps) =>
      val seqs = ps.map(_._3)
      assert(seqs === (0L to seqs.max).toSet, s"$src seq_idx not dense")
    }
    // every doc placed exactly once
    assert(got.map(r => (r._1, r._2)).size === rows.size)
  }

  test("subShards: concat conserves tokens, respects budget, dense seq_idx") {
    val rnd = new scala.util.Random(7L)
    val budget = 40L
    val rows = (1L to 250L).map(i => (s"s${i % 2}", i, rnd.nextInt(60).toLong))
    val got = Packing.packConcat(
      rnd.shuffle(rows).toDF("src", "id", "toks").repartition(9),
      col("src"), "id", col("toks"), budget, 4)
      .as[(String, Long, Long, Long, Long)].collect()
    // per-doc slice totals reconstruct the token counts (placed exactly once)
    val totals = got.groupBy(c => (c._1, c._2)).view
      .mapValues(_.map(_._5).sum).toMap
    assert(totals === rows.map(r => ((r._1, r._2), r._3)).toMap)
    // no sequence overflows; indices dense per shard
    val bySeq = got.groupBy(c => (c._1, c._3)).view
      .mapValues(_.map(_._5).sum).toMap
    bySeq.foreach { case ((src, seq), fill) =>
      assert(fill <= budget, s"($src,$seq) overflows: $fill")
    }
    got.groupBy(_._1).foreach { case (src, ps) =>
      val seqs = ps.map(_._3).toSet
      assert(seqs === (0L to seqs.max).toSet, s"$src seq_idx not dense")
    }
  }

  test("packTokensGlobal: concatenating sequences in seq_id order " +
    "reconstructs the corpus token stream; all but the last sequence " +
    "are exactly full; empty/short docs fold in") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "  zeta   eta  "), // ragged whitespace
      (3L, ""),               // no tokens
      (4L, (1 to 40).map(i => s"t$i").mkString(" ")),
      (5L, "last few tokens here")
    ).toDF("doc_id", "text")
    val L = 8
    val got = Packing.packTokensGlobal(docs, seqTokens = L)
      .as[(Long, Long, String)].collect().sortBy(_._1)
    val wantStream = Seq(
      "alpha beta gamma delta epsilon", "zeta eta", "",
      (1 to 40).map(i => s"t$i").mkString(" "), "last few tokens here")
      .flatMap(_.split("\\s+").filter(_.nonEmpty))
    val gotStream = got.toSeq.flatMap(_._3.split(''))
    assert(gotStream === wantStream)
    assert(got.map(_._1).toSeq === got.indices.map(_.toLong))
    got.init.foreach(r => assert(r._2 === L.toLong, r.toString()))
    assert(got.last._2 === (wantStream.size % L match {
      case 0 => L.toLong; case r => r.toLong
    }))
    val e = intercept[IllegalArgumentException] {
      Packing.packTokensGlobal(docs, seqTokens = 0)
    }
    assert(e.getMessage.contains("seqTokens"))
  }

  test("greedy plan: one exchange on the shard key, no join") {
    val df = Seq(("a", 1L, 4L), ("b", 2L, 5L)).toDF("src", "id", "toks")
    val plan = Packing.packGreedy(df, col("src"), "id", col("toks"), 10L)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      s"expected 1 exchange:\n$plan")
    assert(!plan.toLowerCase.contains("join"), s"unexpected join:\n$plan")
  }
}
