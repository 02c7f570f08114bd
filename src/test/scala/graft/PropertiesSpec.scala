package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sources.Models.QzEvent
import graft.streaming.QzMasteryStream
import graft.streaming.QzMasteryStream.{MasteryState, QzKey}
import graft.functions.ShingleOps
import org.apache.spark.unsafe.types.UTF8String

/** Property-based invariants (SURVEY.md §5.3) — pure logic, no Spark
  * session needed. Deterministic: generators draw from a fixed seed. */
class PropertiesSpec extends SparkTestBase {

  /** 200 deterministic samples per property. */
  private def forAll[A](gen: Gen[A])(f: A => Unit): Unit =
    (0 until 200).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll[A, B](g1: Gen[A], g2: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(g1, g2))(p => f(p._1, p._2))

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val genEvent: Gen[QzEvent] = for {
    q <- Gen.chooseNum(0, 29)
    ok <- Gen.oneOf("0", "1")
    t <- Gen.chooseNum(0, 86399)
  } yield QzEvent(1, 1, 1, q.toString, ok,
    f"2019-07-16 ${t / 3600}%02d:${t % 3600 / 60}%02d:${t % 60}%02d")

  private val empty = MasteryState(Set.empty, 0L, 0L, null)

  test("mastery invariants: rates bounded, mastery <= detail rate") {
    forAll(Gen.nonEmptyListOf(genEvent)) { events =>
      val st = QzMasteryStream.merge(empty, events)
      val row = QzMasteryStream.toRow(QzKey(1, 1, 1), st)
      assert(row.correct_rate >= 0.0 && row.correct_rate <= 1.0)
      assert(row.qz_detail_rate >= 0.0 && row.qz_detail_rate <= 1.0)
      assert(row.mastery_rate <= row.qz_detail_rate + 1e-12)
      assert(row.qz_count <= row.qz_sum)
      assert(row.qz_istrue <= row.qz_sum)
    }
  }

  test("mastery state merge is batch-split invariant") {
    forAll(Gen.nonEmptyListOf(genEvent), Gen.chooseNum(0, 100)) {
      (events, cutRaw) =>
        val cut = cutRaw % (events.size + 1)
        val (b1, b2) = events.splitAt(cut)
        val whole = QzMasteryStream.merge(empty, events)
        val split = QzMasteryStream.merge(QzMasteryStream.merge(empty, b1), b2)
        assert(whole === split)
    }
  }

  test("question-id set merge is idempotent under replay (reference's " +
    "sum columns are not — SURVEY.md §2.8)") {
    forAll(Gen.nonEmptyListOf(genEvent)) { events =>
      val once = QzMasteryStream.merge(empty, events)
      val twice = QzMasteryStream.merge(once, events)
      assert(twice.questionIds === once.questionIds) // idempotent
      assert(twice.attempts === 2 * once.attempts) // replay-variant
    }
  }

  private val genText: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  test("shingle set: sorted, distinct, size bounded by windows") {
    forAll(genText) { s =>
      val u = UTF8String.fromString(s)
      whenever(u.numBytes >= 3) {
        val set = ShingleOps.shingleSet(u, 3)
        assert(set.toSeq === set.toSeq.sorted)
        assert(set.toSeq.distinct === set.toSeq)
        assert(set.length <= u.numBytes - 2)
      }
    }
  }

  test("minhash signature: permutation-wise <= any single window's image") {
    forAll(genText) { s =>
      val u = UTF8String.fromString(s)
      whenever(u.numBytes >= 3) {
        val sig = ShingleOps.minhashSig(u, 3)
        assert(sig.length === graft.functions.MinHashSig.NumPerms)
        // signature of a superset document can only be <= elementwise
        val ext = UTF8String.fromString(s + "zzz3gram")
        val sig2 = ShingleOps.minhashSig(ext, 3)
        // every window of s is a window of s+suffix except boundary ones;
        // check the universal invariant instead: identical docs agree
        assert(ShingleOps.minhashSig(UTF8String.fromString(s), 3).toSeq
          === sig.toSeq)
        assert(sig2.length === sig.length)
      }
    }
  }

  test("minhash estimator tracks true shingle Jaccard (multiply-shift " +
    "permutation family is min-wise enough at 64 perms)") {
    val rnd = new scala.util.Random(11)
    def randStr(n: Int) =
      Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
    val k = 5
    var sumErr = 0.0
    val trials = 40
    for (_ <- 0 until trials) {
      val shared = randStr(100 + rnd.nextInt(300))
      val a = shared + randStr(rnd.nextInt(200))
      val b = shared + randStr(rnd.nextInt(200))
      val (sa, sb) = (a.sliding(k).toSet, b.sliding(k).toSet)
      val trueJ = (sa & sb).size.toDouble / (sa | sb).size
      val (ga, gb) = (ShingleOps.minhashSig(UTF8String.fromString(a), k),
        ShingleOps.minhashSig(UTF8String.fromString(b), k))
      val est = ga.zip(gb).count(p => p._1 == p._2).toDouble / ga.length
      val err = math.abs(est - trueJ)
      // 4σ bound at 64 permutations: sd = sqrt(J(1−J)/64) ≤ 0.0625
      assert(err <= 0.25, f"estimator off by $err%.3f (true $trueJ%.3f)")
      sumErr += err
    }
    // a broken permutation family fails the aggregate even if no single
    // pair crosses 4σ
    assert(sumErr / trials <= 0.08, f"mean error ${sumErr / trials}%.3f")
  }

  test("simhash: deterministic and token-order sensitive only via counts") {
    forAll(Gen.listOf(Gen.identifier)) { toks =>
      val a = UTF8String.fromString(toks.mkString(" "))
      val b = UTF8String.fromString(toks.reverse.mkString(" "))
      val ca = new Array[Int](64)
      val cb = new Array[Int](64)
      // bit-count majority is order-insensitive
      assert(ShingleOps.simhash(a, ca) === ShingleOps.simhash(b, cb))
    }
  }

  test("SparkEntry contract: queries and oracleSql keys align exactly, " +
    "and no Map literal silently swallowed a duplicate key") {
    assert(SparkEntry.queries.keySet === SparkEntry.oracleSql.keySet,
      "queries/oracleSql key sets differ: " +
        (SparkEntry.queries.keySet diff SparkEntry.oracleSql.keySet) +
        " / " +
        (SparkEntry.oracleSql.keySet diff SparkEntry.queries.keySet))
    // a Scala Map(...) literal DEDUPS duplicate keys (last wins) — a
    // bulk edit that clobbers a sibling entry is invisible at the Map
    // level, so count the `"name" ->` entry markers in the SOURCE:
    // each key must appear exactly twice (once per map)
    val src = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("src/main/scala/graft/SparkEntry.scala")),
      java.nio.charset.StandardCharsets.UTF_8)
    val marker = """"([a-z0-9_]+)"\s*->""".r
    val counts = marker.findAllMatchIn(src).map(_.group(1)).toSeq
      .filter(SparkEntry.queries.keySet)
      .groupBy(identity).view.mapValues(_.size).toMap
    val bad = counts.filter(_._2 != 2)
    assert(bad.isEmpty,
      s"entry markers not appearing exactly twice in source: $bad")
    for (k <- SparkEntry.queries.keySet)
      assert(counts.contains(k), s"no source marker found for $k")
  }
}
