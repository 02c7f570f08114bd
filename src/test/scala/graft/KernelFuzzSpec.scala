package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{BpeExprs, SetExprs, TokenWindowExprs, UnigramExprs, VectorExprs}

/** Adversarial property fuzzing for the codegen expression kernels
  * (TokenWindowExprs, BpeExprs, SetExprs, VectorExprs): empty / huge /
  * astral-plane strings, tokens containing the separator, NaN / ±0
  * vectors. Every property compares the DataFrame (codegen) result
  * against an independent driver-side reference — and the dataframe
  * evaluation itself exercises eval≡codegen because ExpressionsSpec
  * pins both paths; here the reference is order-independent set/seq
  * arithmetic, so sorting subtleties (UTF8String binary order vs Java
  * UTF-16 order on surrogate pairs) cannot mask a kernel bug.
  *
  * Deterministic: generators draw from fixed seeds.
  */
class KernelFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int = 120): Seq[A] =
    (0 until n).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)))

  // token alphabet stressing every representation corner: empty-ish
  // ascii, multibyte BMP, astral plane (surrogate pairs in UTF-16),
  // combining marks, a token equal to the separator's neighbors
  private val tokenGen: Gen[String] = Gen.oneOf(
    "a", "b", "the", "é", "héllo", "日本", "𝄞", "🂡𝔘", "é",
    "x" * 300, "𝕏" * 80, "-", "_")

  private val textGen: Gen[String] = for {
    toks <- Gen.listOfN(12, tokenGen)
    n <- Gen.chooseNum(0, 12)
  } yield toks.take(n).mkString(" ")

  test("TokenWindowFps fuzz: fp count = max(nTokens-L+1, 0) and fp " +
    "equality ≡ token-window equality, under split(text, ' ') semantics") {
    for (l <- Seq(2, 3, 5)) {
      val texts = samples(textGen) ++ Seq("", " ", "  ", "a  b",
        "𝄞 𝄞 𝄞 𝄞 𝄞", "x" * 10000 + " y " + "x" * 10000)
      val fps = texts.toDF("text")
        .select(col("text"),
          TokenWindowExprs.tokenWindowFps(col("text"), l).as("fps"))
        .as[(String, Seq[Long])].collect()
      // global fp ↔ window consistency across ALL documents
      val seen = scala.collection.mutable.Map.empty[Long, Seq[String]]
      for ((text, f) <- fps) {
        // split(text, " ") keeps empty tokens — the documented contract
        val toks = text.split(" ", -1).toSeq
        assert(f.length === math.max(toks.length - l + 1, 0),
          s"count for '$text' L=$l")
        for ((fp, i) <- f.zipWithIndex) {
          val win = toks.slice(i, i + l)
          seen.get(fp) match {
            case Some(w) => assert(w === win,
              s"fp collision/mismatch at '$text' pos $i L=$l")
            case None => seen(fp) = win
          }
        }
      }
      // distinct windows got distinct fps (no systematic collision)
      assert(seen.values.toSeq.distinct.size === seen.size)
    }
  }

  test("BPE kernel fuzz: mergeAdjacent equals the greedy reference and " +
    "encodeAll equals the merge fold, on adversarial token arrays") {
    def refMerge(s: Vector[String], l: String, r: String,
        sep: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var j = 0
      while (j < s.length) {
        if (j + 1 < s.length && s(j) == l && s(j + 1) == r) {
          b += (l + sep + r); j += 2
        } else { b += s(j); j += 1 }
      }
      b.result()
    }
    val arrGen = for {
      n <- Gen.chooseNum(0, 10)
      toks <- Gen.listOfN(n, tokenGen)
    } yield toks.toVector
    val pairGen = Gen.zip(arrGen, tokenGen, tokenGen)
    val cases = samples(pairGen) ++ Seq(
      (Vector.empty[String], "a", "b"),
      (Vector("a"), "a", "a"),
      (Vector("a", "a", "a", "a", "a"), "a", "a"), // overlap runs
      (Vector("𝄞", "🂡𝔘", "𝄞", "🂡𝔘"), "𝄞", "🂡𝔘"),
      (Vector("a b", "c"), "a b", "c")) // token CONTAINING the sep
    val df = cases.map { case (arr, l, r) => (arr, l, r) }
      .toDF("arr", "l", "r")
      .select(col("arr"), col("l"), col("r"),
        BpeExprs.mergeAdjacent(col("arr"), col("l"), col("r"), " ")
          .as("merged"))
      .as[(Seq[String], String, String, Seq[String])].collect()
    for ((arr, l, r, got) <- df)
      assert(got === refMerge(arr.toVector, l, r, " "),
        s"mergeAdjacent($arr, $l, $r)")

    // encodeAll ≡ folding mergeAdjacent over the table in rank order
    val tableGen = for {
      m <- Gen.chooseNum(0, 6)
      ls <- Gen.listOfN(m, tokenGen)
      rs <- Gen.listOfN(m, tokenGen)
    } yield (ls, rs)
    val encCases = samples(Gen.zip(arrGen, tableGen), 80)
    val enc = encCases.map { case (arr, (ls, rs)) => (arr, ls, rs) }
      .toDF("arr", "ls", "rs")
      .select(col("arr"), col("ls"), col("rs"),
        BpeExprs.encode(col("arr"), col("ls"), col("rs"), " ").as("e"))
      .as[(Seq[String], Seq[String], Seq[String], Seq[String])].collect()
    for ((arr, ls, rs, got) <- enc) {
      val want = ls.zip(rs).foldLeft(arr.toVector) {
        case (acc, (l, r)) => refMerge(acc, l, r, " ")
      }
      assert(got === want, s"encodeAll($arr, $ls, $rs)")
    }
  }

  test("BPE rank-heap encoder ≡ greedy fold (heap≡greedy law) on " +
    "small-alphabet adversarial tables: duplicate ranks, null symbols, " +
    "later merges creating earlier-rank pairs, heavy concat collisions") {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.BpeOps
    def ad(xs: Seq[String]): ArrayData = new GenericArrayData(
      xs.map(x => if (x == null) null else UTF8String.fromString(x)).toArray)
    def strs(a: ArrayData): Seq[String] = (0 until a.numElements()).map { i =>
      val u = a.getUTF8String(i); if (u == null) null else u.toString
    }
    def check(arr: Seq[String], ls: Seq[String], rs: Seq[String],
        sep: String, label: String): Unit = {
      val sepU = UTF8String.fromString(sep)
      val greedy = strs(BpeOps.encodeAllGreedy(ad(arr), ad(ls), ad(rs), sepU))
      val heap = strs(BpeOps.encodeHeap(ad(arr),
        new BpeOps.CompiledTable(ad(ls), ad(rs), sepU)))
      assert(heap === greedy, s"$label arr=$arr ls=$ls rs=$rs sep='$sep'")
    }
    // explicit adversarial constructions
    // (1) rank0's pair only EXISTS after rank1 fires — the sequential
    // fold never applies rank0 (already passed); a naive min-rank
    // re-check encoder would. The heap must match the fold.
    check(Seq("x", "a", "b"), Seq("x", "a"), Seq("ab", "b"), "", "earlier-rank")
    // (2) duplicate pair at two ranks with an interleaved destroyer
    check(Seq("a", "a", "a", "b", "b"), Seq("a", "b", "a"),
      Seq("a", "b", "a"), "", "dup-rank")
    // (3) pair destroyed before its rank is reached
    check(Seq("a", "b", "c"), Seq("a", "b"), Seq("b", "c"), "", "destroyed")
    // (4) nulls in table and in the word
    check(Seq("a", null, "b", "a", "b"), Seq(null, "a", "b"),
      Seq("b", null, "a"), "", "nulls")
    check(Seq.empty, Seq("a"), Seq("b"), "", "empty-word")
    check(Seq("a", "b"), Seq.empty, Seq.empty, "", "empty-table")
    // (5) randomized small-alphabet storm: sep="" makes merged symbols
    // collide with base/later symbols constantly — the regime where the
    // skip-rank bookkeeping could diverge from the fold if wrong
    val pool = Vector("a", "b", "aa", "ab", "ba", "bb", "aab", "aba", "abb")
    val rnd = new scala.util.Random(20260814L)
    for (trial <- 1 to 600) {
      val arr = Seq.fill(rnd.nextInt(12))(pool(rnd.nextInt(3)))
      val m = rnd.nextInt(10)
      val ls = Seq.fill(m)(pool(rnd.nextInt(pool.size)))
      val rs = Seq.fill(m)(pool(rnd.nextInt(pool.size)))
      check(arr, ls, rs, "", s"storm-$trial")
    }
    // (6) same storm with a non-empty separator (word-level regime)
    for (trial <- 1 to 200) {
      val arr = Seq.fill(rnd.nextInt(10))(pool(rnd.nextInt(4)))
      val m = rnd.nextInt(8)
      val ls = Seq.fill(m)(pool(rnd.nextInt(pool.size)))
      val rs = Seq.fill(m)(pool(rnd.nextInt(pool.size)))
      check(arr, ls, rs, " ", s"sep-storm-$trial")
    }
  }

  test("char-BPE path fuzz: bpeEncodeChar equals the per-word " +
    "char-init + merge fold on adversarial unicode text (astral " +
    "plane, combining marks, huge words, words containing '</w>')") {
    def refMerge(s: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var j = 0
      while (j < s.length) {
        if (j + 1 < s.length && s(j) == l && s(j + 1) == r) {
          b += (l + r); j += 2
        } else { b += s(j); j += 1 }
      }
      b.result()
    }
    def charInitRef(w: String): Vector[String] = {
      val cps = w.codePoints().toArray.toVector
        .map(cp => new String(Character.toChars(cp)))
      if (cps.isEmpty) Vector.empty else cps.init :+ (cps.last + "</w>")
    }
    // symbol generator for merge tables: single code points (incl.
    // astral) and small concatenations, some eow-suffixed
    val symGen: Gen[String] = Gen.oneOf(
      "a", "b", "t", "h", "e", "é", "日", "𝄞", "🂡", "ab", "th",
      "e</w>", "he</w>", "𝄞</w>", "<", "/", "w", ">", "</w>")
    val charTextGen: Gen[String] = for {
      toks <- Gen.listOfN(10, Gen.oneOf(
        "the", "a", "ab", "abab", "éé", "日本", "𝄞𝄞𝄞", "🂡a🂡",
        "x" * 500, "a</w>b", "</w>", "é"))
      n <- Gen.chooseNum(0, 10)
    } yield toks.take(n).mkString(" ")
    val tableGen = for {
      m <- Gen.chooseNum(0, 6)
      ls <- Gen.listOfN(m, symGen)
      rs <- Gen.listOfN(m, symGen)
    } yield (ls, rs)
    val cases = samples(Gen.zip(charTextGen, tableGen), 100) ++ Seq(
      ("", (Nil, Nil)), ("   ", (Nil, Nil)),
      ("aaaa", (List("a"), List("a"))),            // overlap runs
      ("𝄞𝄞 𝄞", (List("𝄞"), List("𝄞</w>"))),        // astral + eow merge
      ("the the", (List("t", "th"), List("h", "e</w>"))))
    val rows = cases.zipWithIndex.map { case ((text, (ls, rs)), i) =>
      (i.toLong, text, ls, rs) }
    val df = rows.toDF("doc_id", "text", "ls", "rs")
    // one table per row is not the operator's shape (it broadcasts ONE
    // table) — so group rows by table and run per group
    for (((ls, rs), grp) <- rows.groupBy { case (_, _, ls, rs) => (ls, rs) }) {
      val merges = ls.zip(rs).zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r, 1L) }
        .toDF("merge_idx", "left", "right", "n_occurrences")
      val in = grp.map { case (id, t, _, _) => (id, t) }.toDF("doc_id", "text")
      val got = graft.operators.Vocab.bpeEncodeChar(
          in, col("doc_id"), col("text"), merges)
        .select(col("id"), col("bpe"), col("n_tokens"))
        .as[(Long, Seq[String], Long)].collect()
        .map { case (k, b, n) => k -> ((b, n)) }.toMap
      for ((id, text, _, _) <- grp) {
        val want = text.split("\\s+").filter(_.nonEmpty).toVector.flatMap {
          w => ls.zip(rs).foldLeft(charInitRef(w)) {
            case (acc, (l, r)) => refMerge(acc, l, r)
          }
        }
        val (gb, gn) = got(id)
        assert(gb === want, s"bpeEncodeChar('$text', $ls, $rs)")
        assert(gn === want.length.toLong)
      }
    }
  }

  test("BPE init kernel ≡ declarative route: initSymbols (char & byte) " +
    "equals the split/hex/regexp column formulas it replaced, per word") {
    // the exact columns charInit/byteInit used before the kernel swap
    def charDecl(w: org.apache.spark.sql.Column) = {
      val cs = array_remove(split(w, ""), "")
      when(size(cs) > 0,
        concat(slice(cs, lit(1), size(cs) - 1),
          array(concat(element_at(cs, lit(-1)), lit("</w>")))))
        .otherwise(array().cast("array<string>"))
    }
    def byteDecl(w: org.apache.spark.sql.Column) = {
      val bs = regexp_extract_all(hex(encode(w, "UTF-8")),
        lit("(..)"), lit(1))
      when(size(bs) > 0,
        concat(slice(bs, lit(1), size(bs) - 1),
          array(concat(element_at(bs, lit(-1)), lit("</w>")))))
        .otherwise(array().cast("array<string>"))
    }
    val words = samples(tokenGen, 120) ++
      Seq("", "é", "日本", "𝄞", "🂡", "a</w>b", "</w>", "x" * 2000,
        "é", "é", "𝕏" * 80)
    val df = words.distinct.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("i", "w")
    val rows = df.select(col("i"),
        BpeExprs.initSymbols(col("w"), "</w>", byteLevel = false).as("kc"),
        charDecl(col("w")).as("dc"),
        BpeExprs.initSymbols(col("w"), "</w>", byteLevel = true).as("kb"),
        byteDecl(col("w")).as("db"))
      .as[(Long, Seq[String], Seq[String], Seq[String], Seq[String])]
      .collect()
    for ((i, kc, dc, kb, db) <- rows) {
      assert(kc === dc, s"char init mismatch on word #$i")
      assert(kb === db, s"byte init mismatch on word #$i")
    }
  }

  test("byte-BPE path fuzz: bpeEncodeByte equals the per-word " +
    "byte-init + merge fold on adversarial unicode text — and the " +
    "hex alphabet makes literal '</w>' text collision-free") {
    def refMerge(s: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var j = 0
      while (j < s.length) {
        if (j + 1 < s.length && s(j) == l && s(j + 1) == r) {
          b += (l + r); j += 2
        } else { b += s(j); j += 1 }
      }
      b.result()
    }
    def byteInitRef(w: String): Vector[String] = {
      val bs = w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .toVector.map(b => f"${b & 0xff}%02X")
      if (bs.isEmpty) Vector.empty else bs.init :+ (bs.last + "</w>")
    }
    // hex-pair symbols (incl. multibyte fragments) and small
    // concatenations, some eow-suffixed
    val symGen: Gen[String] = Gen.oneOf(
      "61", "62", "74", "68", "65", "C3", "A9", "E6", "97", "A5",
      "F0", "9D", "84", "9E", "6162", "7468", "65</w>", "9E</w>",
      "61</w>", "A9</w>")
    val byteTextGen: Gen[String] = for {
      toks <- Gen.listOfN(10, Gen.oneOf(
        "the", "a", "ab", "abab", "éé", "日本", "𝄞𝄞𝄞", "🂡a🂡",
        "x" * 500, "a</w>b", "</w>", "é"))
      n <- Gen.chooseNum(0, 10)
    } yield toks.take(n).mkString(" ")
    val tableGen = for {
      m <- Gen.chooseNum(0, 6)
      ls <- Gen.listOfN(m, symGen)
      rs <- Gen.listOfN(m, symGen)
    } yield (ls, rs)
    val cases = samples(Gen.zip(byteTextGen, tableGen), 100) ++ Seq(
      ("", (Nil, Nil)), ("   ", (Nil, Nil)),
      ("aaaa", (List("61"), List("61"))),          // overlap runs
      ("𝄞𝄞 𝄞", (List("84"), List("9E</w>"))),      // astral tail + eow
      ("the the", (List("74", "7468"), List("68", "65</w>"))))
    val rows = cases.zipWithIndex.map { case ((text, (ls, rs)), i) =>
      (i.toLong, text, ls, rs) }
    for (((ls, rs), grp) <- rows.groupBy { case (_, _, ls, rs) => (ls, rs) }) {
      val merges = ls.zip(rs).zipWithIndex
        .map { case ((l, r), i) => (i.toLong, l, r, 1L) }
        .toDF("merge_idx", "left", "right", "n_occurrences")
      val in = grp.map { case (id, t, _, _) => (id, t) }.toDF("doc_id", "text")
      val got = graft.operators.Vocab.bpeEncodeByte(
          in, col("doc_id"), col("text"), merges)
        .select(col("id"), col("bpe"), col("n_tokens"))
        .as[(Long, Seq[String], Long)].collect()
        .map { case (k, b, n) => k -> ((b, n)) }.toMap
      for ((id, text, _, _) <- grp) {
        val want = text.split("\\s+").filter(_.nonEmpty).toVector.flatMap {
          w => ls.zip(rs).foldLeft(byteInitRef(w)) {
            case (acc, (l, r)) => refMerge(acc, l, r)
          }
        }
        val (gb, gn) = got(id)
        assert(gb === want, s"bpeEncodeByte('$text', $ls, $rs)")
        assert(gn === want.length.toLong)
        // the marker appears ONLY as a symbol suffix: literal "</w>"
        // in text becomes hex 3C2F773E, so no symbol body can contain
        // the marker string
        assert(gb.forall(s => !s.dropRight(4).contains("</w>")))
      }
    }
  }

  test("Set kernel fuzz: sorted merge kernels equal order-independent " +
    "set arithmetic after sort_array, including astral-plane strings " +
    "(UTF8 binary order ≠ Java UTF-16 order there)") {
    val strSetGen = for {
      n <- Gen.chooseNum(0, 10)
      toks <- Gen.listOfN(n, tokenGen)
    } yield toks
    val cases = samples(Gen.zip(strSetGen, strSetGen))
    // the kernels require sorted inputs — sort INSIDE the plan with
    // sort_array so the order is the engine's own UTF8 binary order
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"),
        SetExprs.sortedIntersectSize(
          array_sort(array_distinct(col("a"))),
          array_sort(array_distinct(col("b")))).as("isz"),
        SetExprs.sortedContainsCount(
          sort_array(col("a")),
          array_sort(array_distinct(col("b")))).as("csz"),
        SetExprs.jaccardGE(
          array_sort(array_distinct(col("a"))),
          array_sort(array_distinct(col("b"))), 0.0).as("j"))
      .as[(Seq[String], Seq[String], Int, Int, Option[Double])].collect()
    for ((a, b, isz, csz, j) <- got) {
      val (sa, sb) = (a.toSet, b.toSet)
      assert(isz === (sa & sb).size, s"intersect $a $b")
      assert(csz === a.count(sb.contains), s"contains $a $b")
      val uni = (sa | sb).size
      if (uni == 0) assert(j.isEmpty, s"jaccard empty-union $a $b")
      else assert(j.contains((sa & sb).size.toDouble / uni),
        s"jaccard $a $b")
    }
  }

  test("DotProduct fuzz: NaN, ±0, infinities — kernel equals the IEEE " +
    "fold, and -0.0 inputs produce the same bits as the reference") {
    val specialD: Gen[Double] = Gen.oneOf(
      0.0, -0.0, 1.5, -2.25, Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, Double.MinPositiveValue, 1e300, -1e300)
    val vecGen = for {
      n <- Gen.chooseNum(0, 6)
      xs <- Gen.listOfN(n, specialD)
      ys <- Gen.listOfN(n, specialD)
    } yield (xs, ys)
    val got = samples(vecGen).toDF("a", "b")
      .select(col("a"), col("b"),
        VectorExprs.dot(col("a"), col("b")).as("d"))
      .as[(Seq[Double], Seq[Double], Option[Double])].collect()
    for ((a, b, d) <- got) {
      val want = a.zip(b).foldLeft(0.0) { case (s, (x, y)) => s + x * y }
      d match {
        case Some(v) =>
          assert(java.lang.Double.doubleToLongBits(v) ===
            java.lang.Double.doubleToLongBits(want) ||
            (v.isNaN && want.isNaN), s"dot $a $b: got $v want $want")
        case None => fail(s"dot $a $b returned null")
      }
    }
  }

  test("BERT WordPiece kernel fuzz: maxMunchBert and maxMunchBertIds " +
    "equal a straightforward code-point reference (greedy longest " +
    "tagged match, whole-word [UNK], ids = 1-based sorted rank) on " +
    "random tagged vocabularies and adversarial words") {
    import org.apache.spark.unsafe.types.UTF8String
    // code-point substring, matching UTF8String.substring semantics
    def cpSub(w: String, i: Int, j: Int): String = {
      val a = w.offsetByCodePoints(0, i)
      val b = w.offsetByCodePoints(0, j)
      w.substring(a, b)
    }
    def cpLen(w: String): Int = w.codePointCount(0, w.length)
    def refBert(word: String, vocab: Set[String]): Vector[String] = {
      val n = cpLen(word)
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < n) {
        var l = n - i
        var hit = 0
        while (l >= 1 && hit == 0) {
          val key =
            if (i == 0) cpSub(word, i, i + l)
            else "##" + cpSub(word, i, i + l)
          if (vocab(key)) hit = l
          l -= 1
        }
        if (hit == 0) return Vector("[UNK]")
        out += (if (i == 0) cpSub(word, i, i + hit)
                else "##" + cpSub(word, i, i + hit))
        i += hit
      }
      out.result()
    }
    val rawPiece: Gen[String] = for {
      n <- Gen.chooseNum(1, 3)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "\u00e9", "\ud834\udd1e"))
    } yield cs.mkString
    val taggedPiece: Gen[String] = for {
      p <- rawPiece
      cont <- Gen.oneOf(true, false)
    } yield if (cont) "##" + p else p
    val vocabGen: Gen[Seq[String]] = for {
      n <- Gen.chooseNum(1, 14)
      ps <- Gen.listOfN(n, taggedPiece)
      unk <- Gen.oneOf(true, false) // "[UNK]" itself in-vocab is legal
    } yield (ps ++ (if (unk) Seq("[UNK]") else Nil)).distinct
    val wordGen: Gen[String] = for {
      n <- Gen.chooseNum(0, 9)
      cs <- Gen.listOfN(n, Gen.oneOf("a", "b", "c", "\u00e9", "\ud834\udd1e", "z"))
    } yield cs.mkString
    val cases = samples(Gen.zip(vocabGen, wordGen), 200) ++ Seq(
      (Seq("a", "##a"), "aaaa"),
      (Seq("ab", "##ab", "a", "##b"), "abab"),
      (Seq("[UNK]", "a"), "az"), // stall with [UNK] in-vocab
      (Seq("\ud834\udd1e", "##\ud834\udd1e"), "\ud834\udd1e\ud834\udd1e"))
      .filter(_._2 != null)
    for ((vocabRaw, word) <- cases if word.nonEmpty) {
      // sorted by UTF8 binary order with positive freqs — the
      // collectVocab contract the routes feed the kernel
      val sorted = vocabRaw.distinct
        .sortBy(UTF8String.fromString)
      val freqs = sorted.map(_ => 1L)
      val (gotP, gotI) = Seq(Tuple1(word)).toDF("w")
        .select(
          UnigramExprs.wordpieceBert(col("w"), typedlit(sorted),
            typedlit(freqs)).as("p"),
          UnigramExprs.wordpieceBertIds(col("w"), typedlit(sorted),
            typedlit(freqs)).as("i"))
        .as[(Seq[String], Seq[Int])].collect()(0)
      val want = refBert(word, sorted.toSet)
      assert(gotP === want, s"pieces for '$word' over $sorted")
      val idOf = sorted.zipWithIndex.toMap
      val wantIds = want.map(p => idOf.get(p).map(_ + 1).getOrElse(0))
      assert(gotI === wantIds, s"ids for '$word' over $sorted")
    }
  }

  test("keyword kernel fuzz: Aho–Corasick counts equal the byte-level " +
    "brute-force definition (overlaps included) on low-alphabet and " +
    "multibyte texts against random keyword sets") {
    import graft.functions.KeywordExprs
    // the definition: every byte offset where the pattern bytes match
    def refCount(text: String, kw: String): Long = {
      val t = text.getBytes("UTF-8")
      val k = kw.getBytes("UTF-8")
      (0 to t.length - k.length).count(p =>
        java.util.Arrays.equals(t, p, p + k.length, k, 0, k.length)).toLong
    }
    // low-alphabet texts force dense overlap; multibyte stresses the
    // byte-walk; the 10k text stresses throughput assumptions
    val acTextGen: Gen[String] = Gen.oneOf(
      Gen.listOfN(40, Gen.oneOf('a', 'b', ' ')).map(_.mkString),
      Gen.listOfN(12, Gen.oneOf("日", "本", "a", "𝄞")).map(_.mkString),
      Gen.const("ab" * 5000))
    val kwPool = Seq("a", "b", "ab", "ba", "aa", "aba", "a a", "b a",
      "abab", "日本", "本", "𝄞", "日a")
    val kwGen: Gen[Seq[String]] =
      Gen.chooseNum(1, kwPool.length).map(n => kwPool.take(n))
    for ((text, kws) <- samples(Gen.zip(acTextGen, kwGen), 150)) {
      val got = Seq(text).toDF("text")
        .select(KeywordExprs.keywordCounts(col("text"), kws))
        .as[Seq[Long]].head()
      val want = kws.map(refCount(text, _))
      assert(got === want, s"counts for '${text.take(60)}' over $kws")
    }
  }

  test("random-projection kernel fuzz: RandomProjectExpr equals the " +
    "driver-side sign-matrix fold bit for bit on random float AND " +
    "double vectors (including ±0, subnormals, huge magnitudes)") {
    import graft.functions.VectorExprs
    def signRef(i: Int, j: Int): Double = {
      val p = 2147483647L
      val x = i.toLong * 131L + j.toLong + 17L
      val y = (x * 48271L + 11L) % p
      val z = (y * y) % p
      val w = (z * 48271L + 17L) % p
      if ((w * w) % p % 2L == 1L) -1.0 else 1.0
    }
    val valGen: Gen[Float] = Gen.oneOf(
      Gen.chooseNum(-1e6f, 1e6f), Gen.oneOf(0.0f, -0.0f, 1e-40f,
        Float.MaxValue / 1e10f, -3.4028e30f))
    for ((d, k) <- Seq((8, 4), (64, 16), (33, 7))) {
      val vecs = samples(Gen.listOfN(d, valGen), 40)
      for (v <- vecs) {
        val want = (0 until k).map { j =>
          var acc = 0.0
          for (i <- 0 until d) acc += v(i).toDouble * signRef(i, j)
          acc / math.sqrt(k.toDouble)
        }
        val gotF = Seq(v).toDF("v")
          .select(VectorExprs.randomProject(col("v"), d, k))
          .as[Seq[Double]].head()
        assert(gotF.map(java.lang.Double.doubleToLongBits) ===
          want.map(java.lang.Double.doubleToLongBits), s"float d=$d k=$k")
        val gotD = Seq(v.map(_.toDouble)).toDF("v")
          .select(VectorExprs.randomProject(col("v"), d, k))
          .as[Seq[Double]].head()
        val wantD = (0 until k).map { j =>
          var acc = 0.0
          for (i <- 0 until d) acc += v(i).toDouble * signRef(i, j)
          acc / math.sqrt(k.toDouble)
        }
        assert(gotD.map(java.lang.Double.doubleToLongBits) ===
          wantD.map(java.lang.Double.doubleToLongBits), s"double d=$d k=$k")
      }
    }
  }

  test("CDC kernel fuzz: rolling-hash chunking equals a from-scratch " +
    "window-hash reference (no rolling update) on random texts, and " +
    "chunks always tile the byte length exactly") {
    import graft.functions.CdcExprs
    val P = 2147483647L
    val B = 257L
    def ref(text: String, w: Int, maskBits: Int): Seq[(Int, Int, Long)] = {
      val b = text.getBytes("UTF-8")
      val n = b.length
      if (n == 0) return Seq.empty
      val mask = (1L << maskBits) - 1
      def poly(from: Int, until: Int): Long = {
        var h = 0L
        for (j <- from until until) h = (h * B + (b(j) & 0xff)) % P
        h
      }
      val b0 = (w to n).filter(i => (poly(i - w, i) & mask) == mask)
      val bs = if (b0.isEmpty || b0.last != n) b0 :+ n else b0
      var s = 0
      bs.map { e => val c = (s, e - s, poly(s, e)); s = e; c }
    }
    val cdcTextGen: Gen[String] = Gen.oneOf(
      Gen.chooseNum(0, 400).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)),
      Gen.listOfN(30, Gen.oneOf("日", "𝄞", "x", " ")).map(_.mkString))
    for ((text, (w, mb)) <- samples(Gen.zip(cdcTextGen,
        Gen.oneOf((8, 4), (16, 6), (32, 5))), 120)) {
      val got = Seq(text).toDF("text")
        .select(CdcExprs.cdcChunks(col("text"), w, mb))
        .as[Seq[(Int, Int, Long)]].head()
      assert(got === ref(text, w, mb),
        s"w=$w mb=$mb text='${text.take(40)}'")
      val bytes = text.getBytes("UTF-8").length
      assert(got.map(_._2).sum === bytes)
      assert(got.forall(_._2 > 0) || bytes == 0)
    }
  }

  test("bounded-CDC kernel fuzz: the LBFS min/max rule equals a " +
    "sequential from-scratch reference on random (text, w, mask, " +
    "min, max) draws; chunks tile exactly, respect maxChunk " +
    "unconditionally and minChunk except the doc-final chunk") {
    import graft.functions.CdcExprs
    val P = 2147483647L
    val B = 257L
    def ref(text: String, w: Int, maskBits: Int, minC: Int,
        maxC: Int): Seq[(Int, Int, Long)] = {
      val b = text.getBytes("UTF-8")
      val n = b.length
      if (n == 0) return Seq.empty
      val mask = (1L << maskBits) - 1
      def poly(from: Int, until: Int): Long = {
        var h = 0L
        for (j <- from until until) h = (h * B + (b(j) & 0xff)) % P
        h
      }
      val matches =
        (w to n).filter(i => (poly(i - w, i) & mask) == mask).toSet
      val bs = scala.collection.mutable.ArrayBuffer.empty[Int]
      var start = 0
      for (i <- 1 to n) {
        val len = i - start
        if (len >= maxC || (len >= minC && i >= w && matches(i))) {
          bs += i; start = i
        }
      }
      if (bs.isEmpty || bs.last != n) bs += n
      var s = 0
      bs.toSeq.map { e => val c = (s, e - s, poly(s, e)); s = e; c }
    }
    val cdcTextGen: Gen[String] = Gen.oneOf(
      Gen.chooseNum(0, 400).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf('a', 'b', 'c', ' ')).map(_.mkString)),
      Gen.listOfN(30, Gen.oneOf("日", "𝄞", "x", " ")).map(_.mkString))
    val geomGen: Gen[((Int, Int), (Int, Int))] = Gen.zip(
      Gen.oneOf((8, 4), (16, 6), (32, 5)),
      Gen.zip(Gen.chooseNum(1, 48), Gen.chooseNum(2, 200))
        .map { case (a, b) => if (a < b) (a, b) else (b - 1, a + 1) })
    for ((text, ((w, mb), (minC, maxC))) <-
        samples(Gen.zip(cdcTextGen, geomGen), 120)) {
      val got = Seq(text).toDF("text")
        .select(CdcExprs.cdcChunksBounded(col("text"), w, mb, minC, maxC))
        .as[Seq[(Int, Int, Long)]].head()
      assert(got === ref(text, w, mb, minC, maxC),
        s"w=$w mb=$mb min=$minC max=$maxC text='${text.take(40)}'")
      val bytes = text.getBytes("UTF-8").length
      assert(got.map(_._2).sum === bytes)
      assert(got.forall(_._2 <= maxC))
      assert(got.dropRight(1).forall(_._2 >= minC))
    }
  }
}
