package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.typedlit
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Multi-keyword occurrence counting: one Aho–Corasick pass per row.
  *
  * Blocklist/taglist screening (bad-word filters, domain-term tagging,
  * license-string detection) is a standard corpus-curation gate. The
  * naive relational shapes are either K regex scans per row (K full
  * passes over the corpus — at 100 TB, K× the scan cost) or an n-gram
  * explode + join (amplifies the corpus through a shuffle). The
  * Aho–Corasick automaton (Aho & Corasick 1975) matches ALL keywords in
  * ONE byte-level pass per row: zero shuffle, cost independent of K.
  *
  * Semantics: for each keyword independently, every occurrence start
  * position counts — overlapping occurrences included, both across
  * keywords ("an" inside "scan") and within one keyword ("aa" twice in
  * "aaa"). Case-sensitive, raw UTF-8 bytes (identical to character
  * matching for any valid UTF-8 — pattern byte sequences align only on
  * code-point boundaries). The SQL oracle replays the same contract by
  * brute-force position scan, so the automaton is verified against the
  * definition, not against another automaton.
  */
object KeywordOps {

  /** Total pattern bytes accepted by one automaton. Bounds the flat
    * byte-indexed transition table (nodes × 256 ints ≈ 1 MB per 1 KB of
    * patterns) — keyword lists are dictionary-sized by nature; a list
    * past this cap should be split or joined relationally. */
  final val MaxPatternBytes = 4096

  /** Byte-level Aho–Corasick automaton with precomputed full goto
    * (every (state, byte) resolves in O(1) — fail links are compiled
    * away) and dictionary-suffix links (`dict`), so matching is
    * O(bytes + matches) per row. */
  final class Automaton(patterns: Array[Array[Byte]]) {
    val nPat: Int = patterns.length
    private val totalBytes = {
      var t = 0
      var p = 0
      while (p < patterns.length) { t += patterns(p).length; p += 1 }
      t
    }
    require(totalBytes <= MaxPatternBytes,
      s"keyword automaton: total pattern bytes $totalBytes exceeds the " +
        s"$MaxPatternBytes cap")
    private val maxNodes = totalBytes + 1
    private val next = {
      val a = new Array[Int](maxNodes * 256)
      java.util.Arrays.fill(a, -1)
      a
    }
    private val patAt = {
      val a = new Array[Int](maxNodes)
      java.util.Arrays.fill(a, -1)
      a
    }
    private val fail = new Array[Int](maxNodes)
    private val dict = new Array[Int](maxNodes)
    private var nNodes = 1

    // trie
    {
      var idx = 0
      while (idx < patterns.length) {
        val p = patterns(idx)
        require(p.length > 0,
          "keyword automaton: empty pattern (would match at every position)")
        var s = 0
        var i = 0
        while (i < p.length) {
          val c = p(i) & 0xff
          var t = next(s * 256 + c)
          if (t == -1) { t = nNodes; nNodes += 1; next(s * 256 + c) = t }
          s = t
          i += 1
        }
        require(patAt(s) == -1,
          "keyword automaton: duplicate pattern at index " + idx +
            " (counts would be ambiguous)")
        patAt(s) = idx
        idx += 1
      }
    }
    // BFS: fail + dict links, then compile fail resolution into `next`
    {
      val queue = new Array[Int](nNodes)
      var qh = 0
      var qt = 0
      dict(0) = -1
      var c = 0
      while (c < 256) {
        val t = next(c)
        if (t == -1) next(c) = 0
        else {
          fail(t) = 0
          dict(t) = -1
          queue(qt) = t; qt += 1
        }
        c += 1
      }
      while (qh < qt) {
        val s = queue(qh); qh += 1
        c = 0
        while (c < 256) {
          val t = next(s * 256 + c)
          val viaFail = next(fail(s) * 256 + c)
          if (t == -1) next(s * 256 + c) = viaFail
          else {
            fail(t) = viaFail
            dict(t) = if (patAt(viaFail) >= 0) viaFail else dict(viaFail)
            queue(qt) = t; qt += 1
          }
          c += 1
        }
      }
    }

    /** Per-pattern occurrence counts over the raw bytes of `text`. */
    def counts(text: UTF8String): Array[Long] = {
      val out = new Array[Long](nPat)
      val base = text.getBaseObject
      val off = text.getBaseOffset
      val nb = text.numBytes
      var s = 0
      var i = 0
      while (i < nb) {
        val b = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xff
        s = next(s * 256 + b)
        var d = if (patAt(s) >= 0) s else dict(s)
        while (d >= 0) {
          out(patAt(d)) += 1
          d = dict(d)
        }
        i += 1
      }
      out
    }
  }

  /** Keyword list compiled to an [[Automaton]], remembering the source
    * array for identity/equality cache checks (the BpeOps discipline). */
  private final class CompiledKeywords(kws: ArrayData) {
    val n: Int = kws.numElements()
    private val raw: Array[UTF8String] = {
      val a = new Array[UTF8String](n)
      var k = 0
      while (k < n) {
        val u = kws.getUTF8String(k)
        require(u != null, "keyword automaton: null pattern at index " + k)
        a(k) = u.clone()
        k += 1
      }
      a
    }
    val automaton: Automaton = new Automaton(raw.map(_.getBytes))
    private def sameAt(ks: ArrayData, k: Int): Boolean = {
      val u = ks.getUTF8String(k)
      u != null && u.equals(raw(k))
    }
    def sameKeywords(ks: ArrayData): Boolean = {
      if (ks.numElements() != n) return false
      var k = 0
      while (k < n) {
        if (!sameAt(ks, k)) return false
        k += 1
      }
      true
    }
    def spotCheck(ks: ArrayData): Boolean = {
      if (ks.numElements() != n) return false
      n == 0 || (sameAt(ks, 0) && sameAt(ks, n - 1))
    }
  }

  private final class CacheSlot {
    var ref: AnyRef = null
    var compiled: CompiledKeywords = null
  }
  private val cache = new ThreadLocal[Array[CacheSlot]] {
    override def initialValue(): Array[CacheSlot] =
      Array(new CacheSlot, new CacheSlot)
  }

  private def compiled(kws: ArrayData): CompiledKeywords = {
    val slots = cache.get()
    var s = 0
    while (s < slots.length) {
      val c = slots(s)
      if (c.compiled != null && (c.ref eq kws) &&
          kws.isInstanceOf[GenericArrayData] && c.compiled.spotCheck(kws))
        return c.compiled
      s += 1
    }
    s = 0
    while (s < slots.length) {
      val c = slots(s)
      if (c.compiled != null && c.compiled.sameKeywords(kws)) {
        c.ref = kws
        return c.compiled
      }
      s += 1
    }
    // construct BEFORE touching the slot: a throwing constructor must
    // not leave an evicted slot pairing old automaton with new refs
    val built = new CompiledKeywords(kws)
    val evicted = slots(1)
    slots(1) = slots(0)
    evicted.ref = kws
    evicted.compiled = built
    slots(0) = evicted
    built
  }

  /** Entry point for eval and codegen: per-keyword occurrence counts of
    * `kws` in `text` as `array<long>` (index-aligned with `kws`). */
  def counts(text: UTF8String, kws: ArrayData): ArrayData =
    new GenericArrayData(compiled(kws).automaton.counts(text))
}

/** Codegen column: per-keyword overlapping-occurrence counts of a
  * literal keyword array in one Aho–Corasick pass. Null text → null. */
case class KeywordCountsExpr(text: Expression, keywords: Expression)
    extends BinaryExpression {

  override def left: Expression = text
  override def right: Expression = keywords

  override def dataType: DataType =
    ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_keyword_counts"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = text.dataType == StringType &&
      (keywords.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, array<string>), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def nullSafeEval(t: Any, k: Any): Any =
    KeywordOps.counts(t.asInstanceOf[UTF8String], k.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, k) =>
      s"graft.functions.KeywordOps.counts($t, $k)")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): KeywordCountsExpr =
    copy(text = l, keywords = r)
}

object KeywordExprs {

  /** Per-keyword overlapping-occurrence counts of `keywords` in `text`
    * (index-aligned `array<long>`); one Aho–Corasick byte pass per row.
    * Keywords must be non-empty, distinct, and total ≤
    * [[KeywordOps.MaxPatternBytes]] bytes. */
  def keywordCounts(text: Column, keywords: Seq[String]): Column = {
    require(keywords.nonEmpty, "keywordCounts: empty keyword list")
    require(keywords.distinct.length == keywords.length,
      "keywordCounts: duplicate keywords")
    GraftColumnBridge.column(KeywordCountsExpr(
      GraftColumnBridge.expression(text),
      GraftColumnBridge.expression(typedlit(keywords))))
  }
}
