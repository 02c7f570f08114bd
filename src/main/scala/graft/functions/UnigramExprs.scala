package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The unigram-LM tokenizer kernel: Viterbi segmentation of one word
  * against a (piece, frequency) vocabulary — the inference step of the
  * SentencePiece unigram model (Kudo, ACL'18), the OTHER production
  * tokenizer family next to BPE. A segmentation's likelihood is
  * ∏ p(piece) with p = freq/total; Viterbi picks the argmax by dynamic
  * programming over word positions.
  *
  * DETERMINISM CONTRACT (what makes the output oracle-replayable on a
  * different engine): piece frequencies are exact integers, `total` is
  * their exact integer sum, and the DP score is built EXCLUSIVELY from
  * `best(i) * (freq.toDouble / total.toDouble)` — one IEEE-754
  * division then one multiplication per candidate, both correctly
  * rounded and therefore bit-identical on any IEEE engine evaluating
  * the same expression shape. Ties (exactly equal doubles) break to
  * the SMALLEST candidate start, i.e. the LONGEST final piece. A
  * single character absent from the vocabulary scores as frequency 1
  * (the UNK floor that keeps every position reachable); multi-char
  * candidates absent from the vocabulary are skipped. Positions are
  * Unicode CODE POINTS (`UTF8String.substring` semantics — matches
  * SQL `substr`).
  *
  * Scale shape: doc-local — no shuffle, vocabulary baked into the plan
  * as bounded literal arrays and compiled once per task via the same
  * identity+spot-check guarded thread-local cache as [[BpeOps]]. Cost
  * O(len · maxPieceLen) map probes per word.
  */
object UnigramOps {

  /** A vocabulary compiled for the Viterbi kernel: piece → (freq, id)
    * hash map, the exact-integer total, and the max piece length (the
    * DP candidate window — any candidate longer than every vocabulary
    * piece can only be a skipped multi-char miss). Ids are 1-based
    * positions in the PIECES ARRAY AS PASSED; the routes pass
    * piece-ascending sorted arrays, making the id the 1-based rank in
    * the sorted vocabulary (the x115 id contract). UTF8Strings are
    * cloned out of the source ArrayData so the compiled form never
    * aliases a transient row buffer. */
  final class CompiledVocab(piecesAD: ArrayData, freqsAD: ArrayData) {
    val n: Int = piecesAD.numElements()
    require(freqsAD.numElements() == n,
      s"unigram vocab: pieces/freqs arity mismatch ($n vs " +
        s"${freqsAD.numElements()})")
    val pieces = new Array[UTF8String](n)
    val freqs = new Array[Long](n)
    // Integer values (not Int): `get` must return null on a miss —
    // Scala's unboxing of a null Int is a silent 0
    val map = new java.util.HashMap[UTF8String, Integer]()
    var total: Double = 0.0
    var maxPieceLen: Int = 1
    locally {
      var t = 0L
      var k = 0
      while (k < n) {
        val p = piecesAD.getUTF8String(k)
        require(p != null && !freqsAD.isNullAt(k),
          "unigram vocab: null piece or freq at rank " + k)
        val f = freqsAD.getLong(k)
        require(f > 0, s"unigram vocab: non-positive freq $f for '$p'")
        val pc = p.clone()
        pieces(k) = pc
        freqs(k) = f
        require(map.put(pc, Integer.valueOf(k)) == null,
          s"unigram vocab: duplicate piece '$p'")
        t += f
        val len = pc.numChars()
        if (len > maxPieceLen) maxPieceLen = len
        k += 1
      }
      total = t.toDouble
    }
    /** Element-k equality against raw (pieces, freqs) ArrayData. */
    private def sameAt(ps: ArrayData, fs: ArrayData, k: Int): Boolean = {
      val p = ps.getUTF8String(k)
      p != null && p.equals(pieces(k)) &&
        !fs.isNullAt(k) && fs.getLong(k) == freqs(k)
    }
    def sameVocab(ps: ArrayData, fs: ArrayData): Boolean = {
      if (ps.numElements() != n || fs.numElements() != n) return false
      var k = 0
      while (k < n) {
        if (!sameAt(ps, fs, k)) return false
        k += 1
      }
      true
    }
    /** O(1) guard behind the identity fast path (the [[BpeOps]]
      * discipline): length plus first/last element equality. */
    def spotCheck(ps: ArrayData, fs: ArrayData): Boolean = {
      if (ps.numElements() != n || fs.numElements() != n) return false
      n == 0 || (sameAt(ps, fs, 0) && sameAt(ps, fs, n - 1))
    }
  }

  private final class CacheSlot {
    var piecesRef: AnyRef = null
    var freqsRef: AnyRef = null
    var vocab: CompiledVocab = null
  }
  private val cache = new ThreadLocal[Array[CacheSlot]] {
    override def initialValue(): Array[CacheSlot] =
      Array(new CacheSlot, new CacheSlot)
  }

  private def compiled(pieces: ArrayData, freqs: ArrayData): CompiledVocab = {
    val slots = cache.get()
    var s = 0
    while (s < slots.length) {
      val c = slots(s)
      if (c.vocab != null &&
          (c.piecesRef eq pieces) && (c.freqsRef eq freqs) &&
          pieces.isInstanceOf[GenericArrayData] &&
          freqs.isInstanceOf[GenericArrayData] &&
          c.vocab.spotCheck(pieces, freqs))
        return c.vocab
      s += 1
    }
    s = 0
    while (s < slots.length) {
      val c = slots(s)
      if (c.vocab != null && c.vocab.sameVocab(pieces, freqs)) {
        c.piecesRef = pieces; c.freqsRef = freqs
        return c.vocab
      }
      s += 1
    }
    // Construct BEFORE touching the slot (the BpeOps discipline): if
    // the constructor throws (corrupt vocab via the raw Column API,
    // which bypasses collectVocab validation), the evicted slot must
    // not be left holding its OLD compiled vocab paired with the NEW
    // array refs — that pairing could later satisfy the identity fast
    // path and silently segment with a stale vocabulary.
    val built = new CompiledVocab(pieces, freqs)
    val evicted = slots(1)
    slots(1) = slots(0)
    val c = evicted
    c.piecesRef = pieces; c.freqsRef = freqs
    c.vocab = built
    slots(0) = c
    built
  }

  /** 2^-512 / 2^512 — the exact power-of-two rescale that keeps the
    * DP likelihood products out of the subnormal range for arbitrarily
    * long words WITHOUT perturbing any comparison: scaling every live
    * entry by the same power of two is an exact float operation, so
    * relative order (and exact ties) are preserved bit-for-bit, and
    * the oracle replays the identical trigger and factor. One rescale
    * per step always suffices: the per-step shrink is ≥ 1/total ≥
    * 2^-63, so from the ≥ 2^-512 invariant the new best is ≥ 2^-575,
    * far above the 2^-1022 normal floor. */
  private val RescaleAt = java.lang.Math.scalb(1.0, -512)
  private val RescaleBy = java.lang.Math.scalb(1.0, 512)

  /** Viterbi backpointers for `word` under `v`: back(j) = chosen start
    * of the piece ending at code-point position j (1-based j). */
  private def viterbiBack(word: UTF8String, v: CompiledVocab): Array[Int] = {
    val n = word.numChars()
    val best = new Array[Double](n + 1)
    val back = new Array[Int](n + 1)
    best(0) = 1.0
    var j = 1
    while (j <= n) {
      var bj = -1.0
      var bi = -1
      var i = math.max(0, j - v.maxPieceLen)
      while (i < j) {
        val piece = word.substring(i, j)
        val idx = v.map.get(piece)
        // single-char UNK floor: frequency 1; multi-char miss: skip
        val f: Double =
          if (idx != null) v.freqs(idx.intValue()).toDouble
          else if (j - i == 1) 1.0
          else -1.0
        if (f > 0) {
          // ONE division then ONE multiplication, in this order — the
          // oracle evaluates the identical IEEE expression shape
          val s = best(i) * (f / v.total)
          if (s > bj) { bj = s; bi = i } // strict: ties keep smallest i
        }
        i += 1
      }
      best(j) = bj
      back(j) = bi
      // underflow guard: rescale the WHOLE state by an exact 2^512 —
      // without this, products hit 0.0 around 35-100 pieces and every
      // later candidate ties at zero (the argmax silently degrades to
      // greedy-longest); the oracle applies the identical rule
      if (bj > 0 && bj < RescaleAt) {
        var t = 0
        while (t <= j) { best(t) *= RescaleBy; t += 1 }
      }
      j += 1
    }
    back
  }

  /** Number of pieces in the backtrace (walk once, no allocation). */
  private def nPieces(back: Array[Int]): Int = {
    var j = back.length - 1
    var k = 0
    while (j > 0) { j = back(j); k += 1 }
    k
  }

  /** Viterbi segmentation of `word`: the argmax piece sequence. */
  def viterbi(word: UTF8String, pieces: ArrayData,
      freqs: ArrayData): ArrayData = {
    val v = compiled(pieces, freqs)
    val back = viterbiBack(word, v)
    val k = nPieces(back)
    val out = new Array[UTF8String](k)
    var j = back.length - 1
    var t = k - 1
    while (j > 0) {
      val i = back(j)
      out(t) = word.substring(i, j)
      t -= 1
      j = i
    }
    new GenericArrayData(out)
  }

  /** WordPiece-style greedy longest-match-first ("max-munch")
    * segmentation — the BERT inference rule: at each position take the
    * LONGEST vocabulary piece matching; if none matches (not even the
    * single character), the character itself is emitted as an UNK
    * piece. Deterministic by construction (string matching only — no
    * arithmetic at all), so oracle replay is trivial. */
  def maxMunch(word: UTF8String, pieces: ArrayData,
      freqs: ArrayData): ArrayData = {
    val v = compiled(pieces, freqs)
    val n = word.numChars()
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    while (i < n) {
      var l = math.min(v.maxPieceLen, n - i)
      var hit = 0
      while (l >= 1 && hit == 0) {
        if (v.map.containsKey(word.substring(i, i + l))) hit = l
        l -= 1
      }
      val take = if (hit > 0) hit else 1
      out.add(word.substring(i, i + take))
      i += take
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  private val ContPrefix = UTF8String.fromString("##")
  private val UnkPiece = UTF8String.fromString("[UNK]")

  /** BERT WordPiece segmentation [Devlin et al., NAACL 2019; the
    * tokenization.py greedy longest-match algorithm]: continuation
    * pieces carry the `##` prefix (position > 0 looks up `##` +
    * substring), and a word with NO matching piece at some visited
    * position — there is no automatic single-char fallback — becomes
    * ONE `[UNK]` token, whole-word. Pure string matching, no
    * arithmetic; `v.maxPieceLen` (which counts the `##` of
    * continuation pieces) is a safe candidate-window upper bound —
    * over-long candidates just miss. */
  def maxMunchBert(word: UTF8String, pieces: ArrayData,
      freqs: ArrayData): ArrayData = {
    val v = compiled(pieces, freqs)
    val n = word.numChars()
    val out = new java.util.ArrayList[UTF8String]()
    var i = 0
    var dead = false
    while (i < n && !dead) {
      var l = math.min(v.maxPieceLen, n - i)
      var hit = 0
      while (l >= 1 && hit == 0) {
        val raw = word.substring(i, i + l)
        val key = if (i == 0) raw else UTF8String.concat(ContPrefix, raw)
        if (v.map.containsKey(key)) hit = l
        l -= 1
      }
      if (hit == 0) dead = true
      else {
        val raw = word.substring(i, i + hit)
        out.add(if (i == 0) raw else UTF8String.concat(ContPrefix, raw))
        i += hit
      }
    }
    if (dead) new GenericArrayData(Array[UTF8String](UnkPiece))
    else new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  /** [[maxMunchBert]] as 1-based vocabulary ids (0 = `[UNK]`). */
  def maxMunchBertIds(word: UTF8String, pieces: ArrayData,
      freqs: ArrayData): ArrayData = {
    val v = compiled(pieces, freqs)
    val seg = maxMunchBert(word, pieces, freqs)
    val k = seg.numElements()
    val out = new Array[Int](k)
    var t = 0
    while (t < k) {
      val idx = v.map.get(seg.getUTF8String(t))
      out(t) = if (idx != null) idx.intValue() + 1 else 0
      t += 1
    }
    new GenericArrayData(out)
  }

  /** [[maxMunch]] as 1-based vocabulary ids (0 = UNK single char). */
  def maxMunchIds(word: UTF8String, pieces: ArrayData,
      freqs: ArrayData): ArrayData = {
    val v = compiled(pieces, freqs)
    val seg = maxMunch(word, pieces, freqs)
    val k = seg.numElements()
    val out = new Array[Int](k)
    var t = 0
    while (t < k) {
      val idx = v.map.get(seg.getUTF8String(t))
      out(t) = if (idx != null) idx.intValue() + 1 else 0
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Candidate arc value at (i, j): the piece frequency, the UNK
    * single-char floor 1, or −1 for a multi-char miss (skip) — the
    * shared lattice rule of [[viterbiBack]] and [[softCounts]]. */
  private def fvAt(word: UTF8String, i: Int, j: Int,
      v: CompiledVocab): Double = {
    val idx = v.map.get(word.substring(i, j))
    if (idx != null) v.freqs(idx.intValue()).toDouble
    else if (j - i == 1) 1.0
    else -1.0
  }

  /** SOFT-EM expected piece counts for one word — the SentencePiece
    * paper's E-step proper (forward–backward over the segmentation
    * lattice) instead of the Viterbi argmax counts of the hard-EM
    * variant: α(j) = Σᵢ α(i)·p(w[i..j]), β mirrored, and the expected
    * count of the arc (i, j) is α(i)·p·β(j)/α(n). Returns one
    * (piece, e) struct per DISTINCT piece string of the word's
    * lattice (UNK single chars included, like [[viterbi]]'s usage
    * counts), e = the sum of its arc expectations.
    *
    * DETERMINISM CONTRACT (the [[viterbiBack]] discipline, extended
    * to sums): frequencies and the total are exact integers; every
    * float op is pinned — per-arc value `α(i) * (f / total)` (forward)
    * and `(f / total) * β(j)` (backward), sums accumulate LEFT TO
    * RIGHT from 0.0 in ascending-(i) / ascending-(j) order, arc
    * expectations fold per piece in ascending (i, j) order, and the
    * one normalization is the final division by α(n) — so an IEEE
    * engine replaying the same shapes (the x145 oracle's
    * list-carrying recursive CTEs) reproduces every double bit for
    * bit, subnormals included. NO underflow rescaling (unlike
    * Viterbi, expectations are cross-scale ratios, so a prefix
    * rescale is not order-transparent): a word so long that the total
    * likelihood underflows to exact 0.0 (≈ hundreds of code points at
    * realistic totals) fails loudly instead of returning NaNs. */
  def softCounts(word: UTF8String, pieces: ArrayData,
      freqs: ArrayData): ArrayData = {
    import org.apache.spark.sql.catalyst.InternalRow
    val v = compiled(pieces, freqs)
    val n = word.numChars()
    val L = v.maxPieceLen
    val al = new Array[Double](n + 1)
    al(0) = 1.0
    var j = 1
    while (j <= n) {
      var acc = 0.0
      var i = math.max(0, j - L)
      while (i < j) {
        val f = fvAt(word, i, j, v)
        if (f > 0) acc += al(i) * (f / v.total)
        i += 1
      }
      al(j) = acc
      j += 1
    }
    val z = al(n)
    if (n > 0 && z <= 0.0)
      throw new IllegalArgumentException(
        "unigram softCounts: total likelihood underflowed to zero — " +
          s"the $n-code-point word exceeds the no-rescale contract")
    val bl = new Array[Double](n + 1)
    if (n >= 0) bl(n) = 1.0
    var i2 = n - 1
    while (i2 >= 0) {
      var acc = 0.0
      var jj = i2 + 1
      val jmax = math.min(n, i2 + L)
      while (jj <= jmax) {
        val f = fvAt(word, i2, jj, v)
        if (f > 0) acc += (f / v.total) * bl(jj)
        jj += 1
      }
      bl(i2) = acc
      i2 -= 1
    }
    val sums = new java.util.LinkedHashMap[UTF8String, java.lang.Double]()
    var i = 0
    while (i < n) {
      var jj = i + 1
      val jmax = math.min(n, i + L)
      while (jj <= jmax) {
        val f = fvAt(word, i, jj, v)
        if (f > 0) {
          val e = ((al(i) * (f / v.total)) * bl(jj)) / z
          val p = word.substring(i, jj)
          val prev = sums.get(p)
          sums.put(p,
            if (prev == null) 0.0 + e else prev.doubleValue() + e)
        }
        jj += 1
      }
      i += 1
    }
    val out = new Array[Any](sums.size())
    val it = sums.entrySet().iterator()
    var t = 0
    while (it.hasNext) {
      val kv = it.next()
      out(t) = InternalRow(kv.getKey, kv.getValue.doubleValue())
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Viterbi segmentation as 1-based vocabulary ids (0 = piece not in
    * the vocabulary — only possible for an UNK single character). */
  def viterbiIds(word: UTF8String, pieces: ArrayData,
      freqs: ArrayData): ArrayData = {
    val v = compiled(pieces, freqs)
    val back = viterbiBack(word, v)
    val k = nPieces(back)
    val out = new Array[Int](k)
    var j = back.length - 1
    var t = k - 1
    while (j > 0) {
      val i = back(j)
      val piece = word.substring(i, j)
      val idx = v.map.get(piece)
      out(t) = if (idx != null) idx.intValue() + 1 else 0
      t -= 1
      j = i
    }
    new GenericArrayData(out)
  }
}

/** Codegen column: segmentation of one word against a literal
  * (pieces, freqs) vocabulary — Viterbi argmax (`greedy = false`, the
  * unigram-LM rule), plain WordPiece max-munch (`greedy = true`), or
  * BERT WordPiece with `##` continuation prefixes and whole-word
  * `[UNK]` (`bert = true`). Null word → null. */
case class UnigramEncodeExpr(word: Expression, pieces: Expression,
    freqs: Expression, asIds: Boolean,
    greedy: Boolean = false, bert: Boolean = false)
    extends TernaryExpression {

  override def first: Expression = word
  override def second: Expression = pieces
  override def third: Expression = freqs

  override def dataType: DataType =
    if (asIds) ArrayType(IntegerType, containsNull = false)
    else ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_encode"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = word.dataType == StringType &&
      (pieces.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }) &&
      (freqs.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>, array<bigint>), " +
        "got " + children.map(_.dataType.sql).mkString(", "))
  }

  private def fnName: String =
    if (bert) { if (asIds) "maxMunchBertIds" else "maxMunchBert" }
    else (asIds, greedy) match {
      case (false, false) => "viterbi"
      case (true, false) => "viterbiIds"
      case (false, true) => "maxMunch"
      case (true, true) => "maxMunchIds"
    }

  override def nullSafeEval(w: Any, p: Any, f: Any): Any = {
    val wu = w.asInstanceOf[UTF8String]
    val pa = p.asInstanceOf[ArrayData]
    val fa = f.asInstanceOf[ArrayData]
    fnName match {
      case "viterbi" => UnigramOps.viterbi(wu, pa, fa)
      case "viterbiIds" => UnigramOps.viterbiIds(wu, pa, fa)
      case "maxMunch" => UnigramOps.maxMunch(wu, pa, fa)
      case "maxMunchIds" => UnigramOps.maxMunchIds(wu, pa, fa)
      case "maxMunchBert" => UnigramOps.maxMunchBert(wu, pa, fa)
      case "maxMunchBertIds" => UnigramOps.maxMunchBertIds(wu, pa, fa)
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, p, f) =>
      s"graft.functions.UnigramOps.$fnName($w, $p, $f)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UnigramEncodeExpr =
    copy(word = f, pieces = s, freqs = t)
}

/** Codegen column: [[UnigramOps.softCounts]] — soft-EM expected piece
  * counts of one word as array&lt;struct&lt;piece, e&gt;&gt;. Null word →
  * null. */
case class UnigramSoftCountsExpr(word: Expression, pieces: Expression,
    freqs: Expression) extends TernaryExpression {

  override def first: Expression = word
  override def second: Expression = pieces
  override def third: Expression = freqs

  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("piece", StringType,
        nullable = false),
      org.apache.spark.sql.types.StructField("e",
        org.apache.spark.sql.types.DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_unigram_soft_counts"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = word.dataType == StringType &&
      (pieces.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      }) &&
      (freqs.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>, array<bigint>), " +
        "got " + children.map(_.dataType.sql).mkString(", "))
  }

  override def nullSafeEval(w: Any, p: Any, f: Any): Any =
    UnigramOps.softCounts(w.asInstanceOf[UTF8String],
      p.asInstanceOf[ArrayData], f.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (w, p, f) =>
      s"graft.functions.UnigramOps.softCounts($w, $p, $f)")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): UnigramSoftCountsExpr =
    copy(word = f, pieces = s, freqs = t)
}

object UnigramExprs {
  def encode(word: Column, pieces: Column, freqs: Column): Column =
    GraftColumnBridge.column(UnigramEncodeExpr(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(pieces),
      GraftColumnBridge.expression(freqs), asIds = false))

  def encodeIds(word: Column, pieces: Column, freqs: Column): Column =
    GraftColumnBridge.column(UnigramEncodeExpr(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(pieces),
      GraftColumnBridge.expression(freqs), asIds = true))

  def wordpiece(word: Column, pieces: Column, freqs: Column): Column =
    GraftColumnBridge.column(UnigramEncodeExpr(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(pieces),
      GraftColumnBridge.expression(freqs), asIds = false, greedy = true))

  def wordpieceIds(word: Column, pieces: Column, freqs: Column): Column =
    GraftColumnBridge.column(UnigramEncodeExpr(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(pieces),
      GraftColumnBridge.expression(freqs), asIds = true, greedy = true))

  def wordpieceBert(word: Column, pieces: Column, freqs: Column): Column =
    GraftColumnBridge.column(UnigramEncodeExpr(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(pieces),
      GraftColumnBridge.expression(freqs), asIds = false, greedy = true,
      bert = true))

  def wordpieceBertIds(word: Column, pieces: Column,
      freqs: Column): Column =
    GraftColumnBridge.column(UnigramEncodeExpr(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(pieces),
      GraftColumnBridge.expression(freqs), asIds = true, greedy = true,
      bert = true))

  def softCounts(word: Column, pieces: Column, freqs: Column): Column =
    GraftColumnBridge.column(UnigramSoftCountsExpr(
      GraftColumnBridge.expression(word),
      GraftColumnBridge.expression(pieces),
      GraftColumnBridge.expression(freqs)))
}
