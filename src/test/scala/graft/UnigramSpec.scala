package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Unigram
import graft.functions.UnigramExprs

/** Unigram-LM tokenizer (Viterbi) — seed vocabulary semantics, the
  * argmax law against exhaustive enumeration, tie-break determinism,
  * route equalities, id mapping, and collectVocab's corruption
  * validation. The exact tie agreement with another engine is proven
  * end-to-end by the x127–x130 DuckDB oracles; here the enumeration
  * check uses the SAME left-associated IEEE fold as the DP, so any
  * segmentation the kernel returns must score ≥ every alternative. */
class UnigramSpec extends SparkTestBase {
  import spark.implicits._

  private def docs(texts: (Long, String)*) =
    texts.toSeq.toDF("doc_id", "text")

  // --- seed vocabulary ----------------------------------------------

  test("seedVocab: within-word multiplicity, word-frequency weighting, " +
    "char floor, minCount and top-K cut") {
    val d = docs(1L -> "aaa bb", 2L -> "aaa", 3L -> "cb")
    // word freqs: aaa×2, bb×1, cb×1
    // substrings (mult × wf): a: 3×2=6, aa: 2×2=4, aaa: 1×2=2,
    //   b: 2×1 + 1×1 = 3, bb: 1, c: 1, cb: 1
    val v = Unigram.seedVocab(d, col("text"), maxPieceLen = 3,
      minCount = 2, vocabSize = 10)
      .as[(String, Long)].collect().toMap
    assert(v === Map("a" -> 6L, "b" -> 3L, "c" -> 1L,
      "aa" -> 4L, "aaa" -> 2L)) // bb/cb fall under minCount; chars stay
    // top-K cut: vocabSize 1 keeps only the most frequent multi-char
    val v1 = Unigram.seedVocab(d, col("text"), maxPieceLen = 3,
      minCount = 2, vocabSize = 1)
      .as[(String, Long)].collect().toMap
    assert(v1 === Map("a" -> 6L, "b" -> 3L, "c" -> 1L, "aa" -> 4L))
  }

  test("seedVocab top-K tie-break is (freq DESC, piece ASC)") {
    // xy and xz both freq 2 — piece ASC keeps xy at vocabSize 1
    val d = docs(1L -> "xy xy xz xz")
    val v = Unigram.seedVocab(d, col("text"), maxPieceLen = 2,
      minCount = 2, vocabSize = 1).as[(String, Long)].collect().toMap
    assert(v("xy") === 2L && !v.contains("xz"))
  }

  // --- Viterbi: argmax law vs exhaustive enumeration -----------------

  /** All segmentations of `w` into pieces of length ≤ maxLen. */
  private def allSegs(w: String, maxLen: Int): Seq[Seq[String]] =
    if (w.isEmpty) Seq(Seq.empty)
    else (1 to math.min(maxLen, w.length)).flatMap(l =>
      allSegs(w.drop(l), maxLen).map(w.take(l) +: _))

  /** The kernel's exact score shape: left-associated fold of
    * best * (freq.toDouble / total). Returns None if the segmentation
    * is inadmissible (a multi-char piece not in vocab). */
  private def segScore(seg: Seq[String], vocab: Map[String, Long],
      total: Double): Option[Double] =
    seg.foldLeft(Option(1.0)) { (acc, p) =>
      acc.flatMap { a =>
        vocab.get(p) match {
          case Some(f) => Some(a * (f.toDouble / total))
          case None if p.length == 1 => Some(a * (1.0 / total))
          case None => None
        }
      }
    }

  private def encodeOne(w: String, vocab: Map[String, Long]): Seq[String] = {
    val sorted = vocab.toSeq.sortBy(_._1)
    Seq(w).toDF("w")
      .select(UnigramExprs.encode(col("w"),
        typedlit(sorted.map(_._1)), typedlit(sorted.map(_._2))).as("p"))
      .as[Seq[String]].head()
  }

  test("Viterbi argmax law: kernel segmentation is admissible, " +
    "concatenates to the word, and scores >= every enumeration") {
    val pieceGen = Gen.oneOf("a", "b", "ab", "ba", "aab", "bb", "aa",
      "bab", "abab")
    val vocabGen: Gen[Map[String, Long]] = for {
      ps <- Gen.listOfN(6, pieceGen)
      fs <- Gen.listOfN(6, Gen.chooseNum(1L, 50L))
    } yield ps.distinct.zip(fs).toMap ++ Map("a" -> 7L, "b" -> 3L)
    val wordGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 9)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    (0 until 60).foreach { i =>
      val vocab = vocabGen(Gen.Parameters.default, Seed(i.toLong)).get
      val w = wordGen(Gen.Parameters.default, Seed(1000L + i)).get
      val total = vocab.values.sum.toDouble
      val maxLen = vocab.keys.map(_.length).max
      val got = encodeOne(w, vocab)
      assert(got.mkString === w, s"concat: $w -> $got")
      val gotScore = segScore(got, vocab, total)
      assert(gotScore.isDefined, s"admissible: $w -> $got vocab=$vocab")
      allSegs(w, maxLen).foreach { seg =>
        segScore(seg, vocab, total).foreach { sc =>
          assert(sc <= gotScore.get,
            s"argmax violated: word=$w kernel=$got (${gotScore.get}) " +
              s"beaten by $seg ($sc) vocab=$vocab")
        }
      }
    }
  }

  test("Viterbi tie-break: equal scores keep the longest final piece " +
    "(smallest start)") {
    // an exact tie needs f(pq)·T = f(p)·f(q) with T the vocab total:
    // f(pq)=2, f(p)=f(q)=6, padded to T=18 with a freq-4 piece —
    // 2·18 = 36 = 6·6. In rationals [pq] = 2/18 equals [p, q] =
    // (6/18)·(6/18); in binary doubles the two evaluations may differ
    // in the last ulp (6/18 is inexact), so FIRST assert the tie
    // materializes on this platform, THEN assert the choice.
    val tieV = Map("pq" -> 2L, "p" -> 6L, "q" -> 6L, "r" -> 4L)
    val t = tieV.values.sum.toDouble
    val s1 = 1.0 * (2.0 / t)
    val s2 = (1.0 * (6.0 / t)) * (6.0 / t)
    assume(s1 == s2, "binary tie did not materialize on this platform")
    assert(encodeOne("pq", tieV) === Seq("pq"),
      "tie must keep the longest final piece")
  }

  test("Viterbi UNK floor: unseen single chars segment as themselves; " +
    "empty and null words behave") {
    val vocab = Map("ab" -> 5L, "a" -> 3L, "b" -> 2L)
    assert(encodeOne("abzab", vocab) === Seq("ab", "z", "ab"))
    val r = Seq[(java.lang.Long, String)]((1L, null), (2L, ""), (3L, "ab"))
      .toDF("doc_id", "text")
    val sorted = vocab.toSeq.sortBy(_._1)
    val enc = Unigram.encode(r, col("doc_id"), col("text"),
      sorted.toDF("piece", "freq"))
      .orderBy("id").as[(Long, Seq[String], Long)].collect()
    assert(enc === Seq((2L, Seq.empty[String], 0L),
      (3L, Seq("ab"), 1L))) // null text dropped, empty text = 0 tokens
  }

  test("encodeIds: 1-based rank in piece-ascending vocab, 0 for UNK; " +
    "ids align with pieces") {
    val d = docs(1L -> "abz ba")
    val vocab = Seq(("ab", 5L), ("a", 3L), ("b", 2L)).toDF("piece", "freq")
    val ids = Unigram.encodeIds(d, col("doc_id"), col("text"), vocab)
      .as[(Long, Seq[Int], Long)].head()
    // sorted vocab: a=1, ab=2, b=3; "abz" -> [ab, z] -> [2, 0];
    // "ba" -> [b, a] -> [3, 1]
    assert(ids === ((1L, Seq(2, 0, 3, 1), 4L)))
  }

  test("reestimate: dictionary route equals per-occurrence counting") {
    val gen = for {
      n <- Gen.chooseNum(1, 8)
      ws <- Gen.listOfN(n, Gen.oneOf("aa", "ab", "aab", "ba", "b", "abab"))
    } yield ws.mkString(" ")
    val texts = (0 until 40).flatMap(i =>
      gen(Gen.Parameters.default, Seed(i.toLong))) :+ "" :+ "aa aa aa"
    val d = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val vocab = Unigram.seedVocab(d, col("text"), maxPieceLen = 3,
      minCount = 2, vocabSize = 8)
    val got = Unigram.reestimate(d, col("text"), vocab)
      .as[(String, Long)].collect().toMap
    // per-occurrence reference: encode every occurrence, count pieces
    val perOcc = Unigram.encode(d, col("doc_id"), col("text"), vocab)
      .select(explode(col("pieces")).as("piece"))
      .groupBy("piece").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got === perOcc)
  }

  test("Viterbi underflow rescale: a 60-piece product (~2^-600) keeps " +
    "the exact argmax instead of degenerating at 0.0") {
    // p(a) = 2^40/T, p(aaa) = 1/T with T ≈ 2^50: three singles score
    // (2^-10)^3 = 2^-30 >> 2^-50, so the argmax is ALL SINGLES — but
    // 60 of them multiply to ~2^-600, far below the double floor.
    // Without the exact 2^512 rescale every candidate ties at 0.0 and
    // the tie rule (longest last piece) would emit "aaa" chunks.
    val vocab = Map("a" -> (1L << 40), "aaa" -> 1L,
      "zfill" -> ((1L << 50) - (1L << 40) - 1L))
    val got = encodeOne("a" * 60, vocab)
    assert(got === Seq.fill(60)("a"))
    // sanity: the same vocabulary still picks "aaa" when it SHOULD —
    // flip the frequencies so the triple dominates
    val v2 = Map("a" -> 1L, "aaa" -> (1L << 40),
      "zfill" -> ((1L << 50) - (1L << 40) - 1L))
    assert(encodeOne("a" * 60, v2) === Seq.fill(20)("aaa"))
  }

  // --- WordPiece max-munch --------------------------------------------

  test("maxMunch: greedy longest-match law — every piece is the " +
    "longest vocab match at its position (or an UNK single char)") {
    val vocabGen: Gen[Map[String, Long]] = for {
      ps <- Gen.listOfN(8, Gen.oneOf("a", "b", "ab", "ba", "aab",
        "bb", "aa", "bab", "abab"))
    } yield ps.distinct.map(_ -> 1L).toMap
    val wordGen: Gen[String] = for {
      n <- Gen.chooseNum(1, 10)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    (0 until 60).foreach { i =>
      val vocab = vocabGen(Gen.Parameters.default, Seed(2000L + i)).get
      val w = wordGen(Gen.Parameters.default, Seed(3000L + i)).get
      val maxLen = vocab.keys.map(_.length).max
      val sorted = vocab.toSeq.sortBy(_._1)
      val got = Seq(w).toDF("w")
        .select(UnigramExprs.wordpiece(col("w"),
          typedlit(sorted.map(_._1)), typedlit(sorted.map(_._2))))
        .as[Seq[String]].head()
      assert(got.mkString === w)
      // replay greedily on the driver
      var pos = 0
      val ref = scala.collection.mutable.Buffer.empty[String]
      while (pos < w.length) {
        val l = (math.min(maxLen, w.length - pos) to 1 by -1)
          .find(l => vocab.contains(w.substring(pos, pos + l)))
          .getOrElse(1)
        ref += w.substring(pos, pos + l)
        pos += l
      }
      assert(got === ref.toSeq, s"word=$w vocab=$vocab")
    }
  }

  test("wordpiece vs viterbi differ where greed is suboptimal, and " +
    "wordpieceIds aligns with pieces") {
    // vocab: ab, bc, c, a, b — word "abc": max-munch takes [ab, c];
    // viterbi with freq(bc) >> others takes [a, bc]
    val vocab = Seq(("ab", 1L), ("bc", 100L), ("a", 1L), ("b", 1L),
      ("c", 1L)).sortBy(_._1)
    val pl = typedlit(vocab.map(_._1)); val fl = typedlit(vocab.map(_._2))
    val (wp, vit, ids) = Seq("abc").toDF("w")
      .select(UnigramExprs.wordpiece(col("w"), pl, fl).as("wp"),
        UnigramExprs.encode(col("w"), pl, fl).as("vit"),
        UnigramExprs.wordpieceIds(col("w"), pl, fl).as("ids"))
      .as[(Seq[String], Seq[String], Seq[Int])].head()
    assert(wp === Seq("ab", "c"))
    assert(vit === Seq("a", "bc"))
    // sorted vocab: a=1, ab=2, b=3, bc=4, c=5 -> [ab, c] = [2, 5]
    assert(ids === Seq(2, 5))
  }

  test("multibyte text: positions are CODE POINTS for both viterbi " +
    "and max-munch (UTF8String.substring ≡ SQL substr semantics)") {
    // pieces mix 1-, 2- and 3-byte chars and an astral-plane char;
    // lengths below are code-point counts, not bytes or UTF-16 units
    val vocab = Seq(("éa", 5L), ("é", 3L), ("a", 2L), ("日本", 4L),
      ("日", 1L), ("本", 1L), ("𝄞", 2L))
    val sorted = vocab.sortBy(v => new String(v._1))
    val pl = typedlit(sorted.map(_._1)); val fl = typedlit(sorted.map(_._2))
    val rows = Seq("éaé", "日本日", "𝄞a𝄞", "é日𝄞z")
    val got = rows.toDF("w")
      .select(col("w"), UnigramExprs.encode(col("w"), pl, fl).as("v"),
        UnigramExprs.wordpiece(col("w"), pl, fl).as("g"))
      .as[(String, Seq[String], Seq[String])].collect().toMap2
    // every segmentation must concatenate back (code-point soundness)
    rows.foreach { w =>
      assert(got(w)._1.mkString === w, s"viterbi concat: $w")
      assert(got(w)._2.mkString === w, s"greedy concat: $w")
    }
    // max-munch takes the longest piece at each position
    assert(got("éaé")._2 === Seq("éa", "é"))
    assert(got("日本日")._2 === Seq("日本", "日"))
    assert(got("𝄞a𝄞")._2 === Seq("𝄞", "a", "𝄞"))
    assert(got("é日𝄞z")._2 === Seq("é", "日", "𝄞", "z")) // z = UNK char
  }

  private implicit class ToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }

  // --- collectVocab validation ---------------------------------------

  test("trainUnigram loop: usage becomes the next round's freq, " +
    "unused multi-char pieces are pruned, chars keep the floor, and " +
    "a stable model is a fixed point across rounds") {
    // words: aab×2 — seed (maxPieceLen 3, minCount 2): chars a:4 b:2,
    // multi aa:2 ab:2 aab:2. Viterbi picks the whole 'aab' (2/12 beats
    // every split), so aa/ab go UNUSED and must be pruned; chars drop
    // to the coalesce(usage, 1) floor
    val d1 = docs(1L -> "aab aab")
    val v1 = Unigram.trainUnigram(d1, col("text"), maxPieceLen = 3,
      minCount = 2, vocabSize = 10, rounds = 1, targetMulti = 1)
      .as[(String, Long)].collect().toMap
    assert(v1 === Map("a" -> 1L, "b" -> 1L, "aab" -> 2L))

    // words: ab×3, b×1 — 'ab' survives with usage 3; a second round
    // under {a:1, b:1, ab:3} re-derives the same model (fixed point)
    val d2 = docs(1L -> "ab ab b", 2L -> "ab")
    val one = Unigram.trainUnigram(d2, col("text"), maxPieceLen = 2,
      minCount = 2, vocabSize = 10, rounds = 1, targetMulti = 1)
      .as[(String, Long)].collect().toMap
    val two = Unigram.trainUnigram(d2, col("text"), maxPieceLen = 2,
      minCount = 2, vocabSize = 10, rounds = 2, targetMulti = 1)
      .as[(String, Long)].collect().toMap
    assert(one === Map("a" -> 1L, "b" -> 1L, "ab" -> 3L))
    assert(two === one)

    // the trained model is a valid tokenizer artifact: encodeIds
    // consumes it through the same collectVocab validation
    val ids = Unigram.encodeIds(d2, col("doc_id"), col("text"),
        Unigram.trainUnigram(d2, col("text"), maxPieceLen = 2,
          minCount = 2, vocabSize = 10, rounds = 2, targetMulti = 1))
      .select($"id", concat_ws(",", $"ids")).as[(Long, String)]
      .collect().toMap
    // sorted vocab: a=1, ab=2, b=3
    assert(ids(1L) === "2,2,3")
    assert(ids(2L) === "2")
  }

  test("collectVocab rejects corrupt vocabularies with named errors") {
    def coll(rows: Seq[(String, java.lang.Long)]) =
      Unigram.collectVocab(rows.toDF("piece", "freq"))
    val dup = intercept[IllegalArgumentException](
      coll(Seq("a" -> Long.box(1L), "a" -> Long.box(2L))))
    assert(dup.getMessage.contains("duplicate"))
    val nul = intercept[IllegalArgumentException](
      coll(Seq("a" -> Long.box(1L), "b" -> null)))
    assert(nul.getMessage.contains("null"))
    val neg = intercept[IllegalArgumentException](
      coll(Seq("a" -> Long.box(0L))))
    assert(neg.getMessage.contains("non-positive"))
    val over = intercept[IllegalArgumentException](
      Unigram.collectVocab(
        (1 to 5).map(i => (s"p$i", Long.box(1L))).toDF("piece", "freq"),
        cap = 3))
    assert(over.getMessage.contains("cap"))
  }

  test("BERT WordPiece: ## continuation lookups, whole-word [UNK] " +
    "with no single-char fallback, ids with [UNK] = 0") {
    // tagged vocab — initial pieces {a, ab}, continuations {##b, ##cd}
    val vocab = Seq(("ab", 5L), ("a", 3L), ("##b", 2L), ("##cd", 2L))
      .toDF("piece", "freq")
    val docs = Seq(
      (1L, "abcd abb ab"),   // ab+##cd | ab+##b | ab
      (2L, "ba abq"),        // 'b' has no INITIAL entry -> [UNK];
                             // 'q' has no continuation -> [UNK]
      (3L, "a"))
      .toDF("doc_id", "text")
    val got = Unigram.wordpieceBertEncode(docs, col("doc_id"),
        col("text"), vocab)
      .select($"id", concat_ws(" ", $"pieces"), $"n_tokens")
      .as[(Long, String, Long)].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) === (("ab ##cd ab ##b ab", 5L)))
    assert(got(2L) === (("[UNK] [UNK]", 2L)))
    assert(got(3L) === (("a", 1L)))
    // ids: sorted vocab ##b=1, ##cd=2, a=3, ab=4; [UNK] -> 0
    val ids = Unigram.wordpieceBertEncodeIds(docs, col("doc_id"),
        col("text"), vocab)
      .select($"id", concat_ws(",", $"ids")).as[(Long, String)]
      .collect().toMap
    assert(ids(1L) === "4,2,4,1,4")
    assert(ids(2L) === "0,0")
    assert(ids(3L) === "3")
  }

  test("wordpieceVocab counts initial and continuation forms " +
    "separately with the char floor on raw length") {
    // words: abab×2, ba×1
    // initial subs of abab (wf 2): a, ab, aba, abab... maxPieceLen 2:
    //   a:2, ab:2; continuations: ##b(pos2):2, ##a(pos3):2, ##b(pos4)
    //   -> ##b total 2+2=4? positions 2,4 of abab: b,b -> ##b:2×2=4;
    //   ##a: 1 per word ×2 = 2; ##ba:2, ##ab:2
    // ba (wf 1): initial b:1, ba:1; continuation ##a:1
    val d = docs(1L -> "abab abab ba")
    val v = Unigram.wordpieceVocab(d, col("text"), maxPieceLen = 2,
      minCount = 2, vocabSize = 10)
      .as[(String, Long)].collect().toMap
    // chars (raw len 1, unconditional): a:2, b:1, ##a:3, ##b:4
    assert(v("a") === 2L && v("b") === 1L)
    assert(v("##a") === 3L && v("##b") === 4L)
    // multi >= minCount 2: ab:2, ##ab:2, ##ba:2 (ba:1 drops)
    assert(v("ab") === 2L && v("##ab") === 2L && v("##ba") === 2L)
    assert(!v.contains("ba"))
  }

  test("interpreted eval equals the dataframe (codegen) result for " +
    "encode and encodeIds") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.UnigramEncodeExpr
    val vocab = Seq(("ab", 5L), ("a", 3L), ("b", 2L)).sorted
    val pLit = Literal.create(
      new GenericArrayData(vocab.map(v => UTF8String.fromString(v._1))
        .toArray[Any]),
      ArrayType(StringType, containsNull = false))
    val fLit = Literal.create(
      new GenericArrayData(vocab.map(_._2).toArray[Any]),
      ArrayType(LongType, containsNull = false))
    val pl = typedlit(vocab.map(_._1)); val fl = typedlit(vocab.map(_._2))
    val words = Seq("abab", "ba", "z", "", "aabba")
    val viaDf = words.toDF("w")
      .select(UnigramExprs.encode(col("w"), pl, fl).as("p"),
        UnigramExprs.encodeIds(col("w"), pl, fl).as("i"),
        UnigramExprs.wordpieceBert(col("w"), pl, fl).as("bp"),
        UnigramExprs.wordpieceBertIds(col("w"), pl, fl).as("bi"))
      .as[(Seq[String], Seq[Int], Seq[String], Seq[Int])]
      .collect().toSeq
    val viaEval = words.map { w =>
      val wl = Literal.create(UTF8String.fromString(w), StringType)
      val ps = UnigramEncodeExpr(wl, pLit, fLit, asIds = false)
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
      val ids = UnigramEncodeExpr(wl, pLit, fLit, asIds = true)
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
      val bps = UnigramEncodeExpr(wl, pLit, fLit, asIds = false,
          greedy = true, bert = true)
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
      val bids = UnigramEncodeExpr(wl, pLit, fLit, asIds = true,
          greedy = true, bert = true)
        .eval(InternalRow.empty).asInstanceOf[ArrayData]
      (ps.toArray[UTF8String](StringType).map(_.toString).toSeq,
        ids.toIntArray().toSeq,
        bps.toArray[UTF8String](StringType).map(_.toString).toSeq,
        bids.toIntArray().toSeq)
    }
    assert(viaDf === viaEval)
  }

  // --- likelihood-scored WordPiece trainer (x143) ---------------------

  test("wordpieceVocabLikelihood equals an independent sequential " +
    "reference: score ranking n/(c(l)*c(r)), (score DESC, l, r) " +
    "tie-break, minCount floor, greedy application, rendered " +
    "char-floor + merge vocabulary with dedup-by-sum") {
    def reference(words: Map[String, Long], nMerges: Int,
        minCount: Long): Map[String, Long] = {
      val M = "\u0001"
      var dict: Map[Vector[String], Long] = words.map { case (w, n) =>
        (w.toVector.zipWithIndex.map { case (c, i) =>
          if (i == 0) M + c else c.toString
        }, n)
      }
      def mergeOnce(s: Vector[String], l: String,
          r: String): Vector[String] = {
        val b = Vector.newBuilder[String]
        var j = 0
        while (j < s.length) {
          if (j + 1 < s.length && s(j) == l && s(j + 1) == r) {
            b += (l + r); j += 2
          } else { b += s(j); j += 1 }
        }
        b.result()
      }
      val seedCounts = dict.toSeq
        .flatMap { case (s, n) => s.map(_ -> n) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val merges = Seq.newBuilder[(String, Long)]
      var round = 0
      var done = false
      while (round < nMerges && !done) {
        val pairs = dict.toSeq.flatMap { case (s, n) =>
          s.zip(s.drop(1)).map(p => p -> n)
        }.groupMapReduce(_._1)(_._2)(_ + _)
          .filter(_._2 >= minCount)
        val syms = dict.toSeq
          .flatMap { case (s, n) => s.map(_ -> n) }
          .groupMapReduce(_._1)(_._2)(_ + _)
        if (pairs.isEmpty) done = true
        else {
          val best = pairs.toSeq.map { case ((l, r), n) =>
            (l, r, n, n.toDouble / (syms(l).toDouble * syms(r).toDouble))
          }.minBy { case (l, r, _, sc) => (-sc, l, r) }
          merges += ((best._1 + best._2, best._3))
          dict = dict.toSeq.map { case (s, n) =>
            (mergeOnce(s, best._1, best._2), n)
          }.groupMapReduce(_._1)(_._2)(_ + _)
        }
        round += 1
      }
      def render(sym: String): String =
        if (sym.startsWith(M)) sym.substring(1) else "##" + sym
      (seedCounts.toSeq.map { case (s, n) => render(s) -> n } ++
        merges.result().map { case (s, n) => render(s) -> n })
        .groupMapReduce(_._1)(_._2)(_ + _)
    }
    // corpus chosen to exercise: score vs raw-count divergence (a
    // frequent pair of very frequent symbols must LOSE to a rarer pair
    // of rare symbols), ties, and multi-round chains
    val d = docs(
      1L -> "aaaa aaaa aaaa xy xy",
      2L -> "aaaa ax ya xy")
    val got = Unigram.wordpieceVocabLikelihood(d, col("text"),
        nMerges = 4, minCount = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val words = Map("aaaa" -> 4L, "xy" -> 3L, "ax" -> 1L, "ya" -> 1L)
    assert(got === reference(words, 4, 2))
    // likelihood ranking beats raw count here: pair (x, ##y) has
    // n=3 and c(x)=3, c(##y)=3 -> score 1/3, while (##a, ##a) has
    // n=8 and c(##a)=13 -> score 8/169 ~ 0.047 - the first merge
    // must be x+##y despite its lower raw count
    assert(got.contains("xy"))
  }

  test("wordpieceVocabLikelihood vocabulary feeds the BERT encode " +
    "directly (the x147 composition) and a word with the internal " +
    "tag char fails loudly") {
    val d = docs(1L -> "abc abc ab")
    val vocab = Unigram.wordpieceVocabLikelihood(d, col("text"),
      nMerges = 3, minCount = 2)
    val enc = Unigram.wordpieceBertEncodeIds(d, col("doc_id"),
      col("text"), vocab)
    assert(enc.collect().forall(_.getLong(2) > 0))
    val bad = docs(1L -> ("a\u0001b ok"))
    val e = intercept[Exception] {
      Unigram.wordpieceVocabLikelihood(bad, col("text"),
        nMerges = 1, minCount = 1).collect()
    }
    assert(e.getMessage.contains("U+0001") ||
      (e.getCause != null && e.getCause.getMessage.contains("U+0001")))
  }

  // --- soft-EM expected counts (the x145 E-step) ----------------------

  test("softReestimate equals brute-force lattice enumeration: for " +
    "every piece, the expected count matches sum over ALL " +
    "segmentations of P(seg)*count(piece), within fp tolerance") {
    val d = docs(1L -> "abab ab", 2L -> "ba aab aab")
    val vocab = Unigram.seedVocab(d, col("text"), maxPieceLen = 4,
      minCount = 1, vocabSize = 64)
    val (ps, fs) = Unigram.collectVocab(vocab)
    val freqOf = ps.zip(fs).toMap
    val total = fs.sum.toDouble
    // brute force: enumerate every segmentation of a word under the
    // lattice rule (vocab pieces any length, UNK floor 1 for single
    // chars), accumulate P(seg) and per-piece counts
    def segs(w: String): Seq[Seq[String]] =
      if (w.isEmpty) Seq(Seq.empty)
      else (1 to w.length).flatMap { l =>
        val piece = w.take(l)
        val f = freqOf.get(piece) match {
          case Some(x) => x.toDouble
          case None => if (l == 1) 1.0 else -1.0
        }
        if (f > 0) segs(w.drop(l)).map(piece +: _) else Seq.empty
      }
    def pSeg(seg: Seq[String]): Double =
      seg.map { p =>
        freqOf.get(p).map(_.toDouble).getOrElse(1.0) / total
      }.product
    val words = Map("abab" -> 1L, "ab" -> 1L, "ba" -> 1L, "aab" -> 2L)
    val want = scala.collection.mutable.Map.empty[String, Double]
    for ((w, wf) <- words) {
      val all = segs(w)
      val z = all.map(pSeg).sum
      for (seg <- all; p <- seg)
        want(p) = want.getOrElse(p, 0.0) + wf * pSeg(seg) / z
    }
    val got = Unigram.softReestimate(d, col("text"), vocab)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    for ((p, w) <- want)
      assert(math.abs(got(p) - w) <= 1e-6 * math.max(1.0, w.abs),
        s"piece '$p': got ${got(p)}, want $w")
  }

  test("softCounts fails loudly when the lattice likelihood " +
    "underflows to zero (the no-rescale contract) and handles " +
    "single-char and fully-UNK words") {
    val v = Seq("a")
    val f = Seq(1000000L) // 1/total = 1e-6: alpha underflows ~55 arcs in

    // a 1-char UNK word: one arc, expectation exactly 1
    val one = Seq(Tuple1("z")).toDF("w")
      .select(UnigramExprs.softCounts(col("w"), typedlit(v),
        typedlit(f)).as("c"))
      .selectExpr("c[0].piece", "c[0].e").collect()(0)
    assert(one.getString(0) === "z" && one.getDouble(1) === 1.0)
    // a word far past the underflow horizon raises, not NaN
    val long = "z" * 400
    val e = intercept[Exception] {
      Seq(Tuple1(long)).toDF("w")
        .select(UnigramExprs.softCounts(col("w"), typedlit(v),
          typedlit(f)).as("c")).collect()
    }
    assert(e.getMessage != null)
  }

  // --- decode / round-trip (the x144 detokenization surface) ---------

  test("wordpieceBertDecodeIds round trip: decode(encode(text)) equals " +
    "the whitespace-normalized input wherever no word collapsed to " +
    "[UNK]; stalled words render the literal [UNK] placeholder") {
    val d = docs(1L -> "abab ab ba", 2L -> "  ab   abab ", 3L -> "")
    val vocab = Unigram.wordpieceVocab(d, col("text"), maxPieceLen = 4,
      minCount = 1, vocabSize = 64)
    val (ps, _) = Unigram.collectVocab(vocab)
    val out = Unigram.wordpieceBertEncodeIds(d, col("doc_id"),
        col("text"), vocab)
      .select(col("id"),
        Unigram.wordpieceBertDecodeIds(col("ids"), typedlit(ps))
          .as("decoded"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "abab ab ba")
    assert(out(2L) === "ab abab") // whitespace-normalized
    assert(out(3L) === "")
    // a word with an uncovered char collapses to [UNK] and renders so
    val d2 = docs(1L -> "ab zq ab")
    val out2 = Unigram.wordpieceBertEncodeIds(d2, col("doc_id"),
        col("text"), vocab)
      .select(Unigram.wordpieceBertDecodeIds(col("ids"), typedlit(ps))
        .as("decoded")).collect()(0).getString(0)
    assert(out2 === "ab [UNK] ab")
  }

  test("wordpieceBertDecodeIds out-of-range ids decode as [UNK] (the " +
    "placeholder policy) instead of failing or vanishing") {
    val v = Seq("##b", "a", "ab")
    val got = Seq(Tuple1(Seq(3, 0, 99, 1)))
      .toDF("ids")
      .select(Unigram.wordpieceBertDecodeIds(col("ids"), typedlit(v))
        .as("d")).collect()(0).getString(0)
    // 3 -> "ab" (new word), 0/99 -> [UNK] (new words), 1 -> "##b" joins
    assert(got === "ab [UNK] [UNK]b")
  }

  test("unigramDecodeIds round trip: piece concatenation reproduces " +
    "the input with whitespace removed on a fully-covered corpus; " +
    "UNK ids render U+FFFD") {
    val d = docs(1L -> "abab ab", 2L -> "ba  baa")
    val vocab = Unigram.seedVocab(d, col("text"), maxPieceLen = 4,
      minCount = 1, vocabSize = 64)
    val (ps, _) = Unigram.collectVocab(vocab)
    val out = Unigram.encodeIds(d, col("doc_id"), col("text"), vocab)
      .select(col("id"),
        Unigram.unigramDecodeIds(col("ids"), typedlit(ps)).as("decoded"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) === "ababab")
    assert(out(2L) === "babaa")
    val unk = Seq(Tuple1(Seq(0)))
      .toDF("ids")
      .select(Unigram.unigramDecodeIds(col("ids"), typedlit(ps)).as("d"))
      .collect()(0).getString(0)
    assert(unk === "\ufffd")
  }
}
