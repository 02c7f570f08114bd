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
  def chunks(text: UTF8String, w: Int, maskBits: Int): GenericArrayData = {
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
    while (i < n) {
      val in = bytes(i) & 0xff
      if (i < w) h = (h * B + in) % P
      else {
        val out = bytes(i - w) & 0xff
        // ((h - out·B^(w−1)) · B + in) mod P, kept non-negative
        h = ((h - (out * pw) % P + P) % P * B + in) % P
      }
      if (i + 1 >= w && (h & mask) == mask) bounds.add(i + 1)
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

/** Codegen column: CDC chunk tuples of one document. Null → null. */
case class CdcChunksExpr(child: Expression, w: Int, maskBits: Int)
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
    CdcOps.chunks(v.asInstanceOf[UTF8String], w, maskBits)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcOps.chunks($c, $w, $maskBits)")

  override protected def withNewChildInternal(
      newChild: Expression): CdcChunksExpr = copy(child = newChild)
}

object CdcExprs {

  /** CDC chunk tuples `array<struct<start,len,fp>>` of `text`; see
    * [[CdcOps]] for the boundary/fingerprint contract. */
  def cdcChunks(text: Column, w: Int = 16, maskBits: Int = 6): Column = {
    require(w >= 2 && w <= 1024, s"cdcChunks: w must be in [2,1024], got $w")
    require(maskBits >= 1 && maskBits <= 30,
      s"cdcChunks: maskBits must be in [1,30], got $maskBits")
    GraftColumnBridge.column(CdcChunksExpr(
      GraftColumnBridge.expression(text), w, maskBits))
  }
}
