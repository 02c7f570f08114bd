package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking (CDC): shift-robust document segmentation.
  *
  * Fixed-offset chunking breaks under insertion — one added byte shifts
  * every later chunk boundary, so a near-duplicate document shares NO
  * chunk fingerprints with its original. CDC places boundaries where a
  * rolling hash of the trailing `w` bytes satisfies a mask predicate
  * (the Rabin-chunking rule of LBFS and every dedup store since): the
  * boundary decision depends only on LOCAL content, so an edit
  * perturbs boundaries only within ~w bytes of the change and every
  * other chunk keeps its fingerprint — exact chunk-level dedup then
  * catches shifted duplicates that fixed windows miss.
  *
  * Arithmetic contract (SQL-replayable, exact BIGINT):
  * polynomial rolling hash base 257 mod the Mersenne prime 2^31−1 over
  * raw UTF-8 bytes. Byte position `i` (1-based, end-exclusive) is a
  * boundary iff `i ≥ w` and the hash of bytes `[i−w, i)` has its low
  * `maskBits` bits all set; the document end is always a boundary.
  * Chunks are the spans between consecutive boundaries; each carries
  * `(start, len, fp)` with `fp` = the same polynomial hash over the
  * whole chunk. Expected chunk length ≈ 2^maskBits bytes. Production
  * CDC systems add min/max chunk bounds; this kernel keeps the pure
  * positional predicate (every boundary is locally decidable — the
  * property the oracle replays); compose a downstream length filter
  * where tiny chunks should not participate in dedup.
  */
object CdcOps {
  final val P = 2147483647L // 2^31 − 1
  final val B = 257L

  /** Chunk tuples (start, len, fp) of `text` — byte offsets; empty
    * array for the empty string. Caller guarantees w ≥ 2 and
    * 1 ≤ maskBits ≤ 30 (checked at Column construction). */
  def chunks(text: UTF8String, w: Int, maskBits: Int): GenericArrayData =
    chunks(text, w, maskBits, 1, Int.MaxValue)

  /** [[chunks]] with the LBFS chunk-length bounds: a mask-predicate
    * boundary is SUPPRESSED while the current chunk is shorter than
    * `minChunk`, and a boundary is FORCED once it reaches `maxChunk`
    * (the rolling hash itself stays global — never reset at a
    * boundary — so a mask match is still a purely local property of
    * the trailing `w` bytes; only its ACCEPTANCE depends on the
    * previous boundary). `(1, Int.MaxValue)` degenerates exactly to
    * the pure positional predicate. The doc-end boundary is always
    * placed, so the FINAL chunk may be shorter than `minChunk`; every
    * chunk is ≤ `maxChunk` unconditionally.
    *
    * Re-sync law (CdcSpec): after an edit, the two segmentations
    * become identical from the first boundary ≥ w bytes past the edit
    * that both place at the same (shifted) position — bounds keep
    * boundary placement Markov in the previous boundary, so
    * divergence cannot survive an aligned boundary. */
  def chunks(text: UTF8String, w: Int, maskBits: Int,
      minChunk: Int, maxChunk: Int): GenericArrayData = {
    val bytes = text.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val mask = (1L << maskBits) - 1L
    // B^(w-1) mod P, for removing the outgoing byte
    var pw = 1L
    var t = 0
    while (t < w - 1) { pw = (pw * B) % P; t += 1 }
    val bounds = new java.util.ArrayList[Integer]()
    var h = 0L
    var i = 0
    var chunkStart = 0
    while (i < n) {
      val in = bytes(i) & 0xff
      if (i < w) h = (h * B + in) % P
      else {
        val out = bytes(i - w) & 0xff
        // ((h - out·B^(w−1)) · B + in) mod P, kept non-negative
        h = ((h - (out * pw) % P + P) % P * B + in) % P
      }
      val pos = i + 1
      val chunkLen = pos - chunkStart
      if (chunkLen >= maxChunk ||
          (chunkLen >= minChunk && pos >= w && (h & mask) == mask)) {
        bounds.add(pos)
        chunkStart = pos
      }
      i += 1
    }
    if (bounds.isEmpty || bounds.get(bounds.size - 1) != n) bounds.add(n)
    val out = new Array[Any](bounds.size)
    var start = 0
    var k = 0
    while (k < bounds.size) {
      val end = bounds.get(k)
      var fp = 0L
      var j = start
      while (j < end) { fp = (fp * B + (bytes(j) & 0xff)) % P; j += 1 }
      out(k) = InternalRow(start, end - start, fp)
      start = end
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** Codegen column: CDC chunk tuples of one document. Null → null.
  * `(minChunk, maxChunk) = (1, Int.MaxValue)` is the pure positional
  * predicate; anything tighter applies the LBFS bounds rule
  * ([[CdcOps.chunks]]). */
case class CdcChunksExpr(child: Expression, w: Int, maskBits: Int,
    minChunk: Int = 1, maxChunk: Int = Int.MaxValue)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("start", IntegerType, nullable = false),
      StructField("len", IntegerType, nullable = false),
      StructField("fp", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdc_chunks"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    CdcOps.chunks(v.asInstanceOf[UTF8String], w, maskBits, minChunk,
      maxChunk)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcOps.chunks($c, $w, $maskBits, $minChunk, " +
        s"${maxChunk match { case Int.MaxValue => "Integer.MAX_VALUE"
          case v => v.toString }})")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunksExpr = copy(child = newChild)
}

object CdcExprs {

  /** CDC chunk tuples `array<struct<start,len,fp>>` of `text`; see
    * [[CdcOps]] for the boundary/fingerprint contract. */
  def cdcChunks(text: Column, w: Int = 16, maskBits: Int = 6): Column =
    cdcChunksBounded(text, w, maskBits, 1, Int.MaxValue)

  /** [[cdcChunks]] with the LBFS chunk-length bounds: mask boundaries
    * suppressed below `minChunk`, forced at `maxChunk` (see
    * [[CdcOps.chunks]]; the final chunk of a doc may still undershoot
    * `minChunk` — the doc end is always a boundary). `maxChunk` must
    * leave the mask predicate room to fire (`maxChunk > minChunk` —
    * enforced). `minChunk ≤ w` is RECOMMENDED geometry, not a
    * requirement: it keeps at least one full hash window per accepted
    * span; `minChunk > w` is well-defined (boundaries are simply
    * suppressed deeper into each chunk) and fuzz-covered. */
  def cdcChunksBounded(text: Column, w: Int, maskBits: Int,
      minChunk: Int, maxChunk: Int): Column = {
    require(w >= 2 && w <= 1024, s"cdcChunks: w must be in [2,1024], got $w")
    require(maskBits >= 1 && maskBits <= 30,
      s"cdcChunks: maskBits must be in [1,30], got $maskBits")
    require(minChunk >= 1, s"cdcChunks: minChunk must be >= 1, got $minChunk")
    require(maxChunk > minChunk,
      s"cdcChunks: maxChunk must exceed minChunk, got ($minChunk, $maxChunk)")
    GraftColumnBridge.column(CdcChunksExpr(
      GraftColumnBridge.expression(text), w, maskBits, minChunk, maxChunk))
  }
}
