package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document character statistics.
  *
  * Character-distribution signals (repetitiveness, charset anomalies,
  * binary junk detection) are standard corpus-quality gates. Shannon
  * entropy is the textbook metric but its value depends on the libm
  * `log` implementation — not bit-reproducible across engines — so the
  * verified surface uses exact integer statistics (counts, squared-count
  * sums) from which rational diversity metrics (Simpson index, top-char
  * fraction) follow by single exactly-rounded IEEE divisions.
  *
  * Exploding a corpus to one row per character to count with SQL would
  * amplify the data ~300× through a shuffle; this kernel counts code
  * points in one byte-level pass per row (128-slot array for ASCII, a
  * small map for the rest): zero shuffle, O(distinct chars) memory.
  */
object CharStatsOps {

  /** [n_codepoints, distinct_codepoints, Σ count², max count].
    * Empty string → [0,0,0,0]. Multibyte sequences are keyed by their
    * raw bytes (injective for valid UTF-8). Σ count² can overflow only
    * past ~3·10⁹ occurrences of one character — beyond any real row. */
  def charStats(s: UTF8String): Array[Long] = {
    val ascii = new Array[Long](128)
    var other: java.util.HashMap[Integer, java.lang.Long] = null
    val nb = s.numBytes
    var i = 0
    var n = 0L
    while (i < nb) {
      val b = s.getByte(i)
      val w = UTF8String.numBytesForFirstByte(b)
      if (w == 1 && b >= 0) {
        ascii(b) += 1
        i += 1
      } else {
        val ww = math.max(1, math.min(w, nb - i))
        var key = 0
        var j = 0
        while (j < ww) { key = (key << 8) | (s.getByte(i + j) & 0xFF); j += 1 }
        if (other == null)
          other = new java.util.HashMap[Integer, java.lang.Long]()
        val prev = other.get(key)
        other.put(key, if (prev == null) 1L else prev + 1L)
        i += ww
      }
      n += 1
    }
    var distinct = 0L
    var sumSq = 0L
    var maxC = 0L
    var k = 0
    while (k < 128) {
      val c = ascii(k)
      if (c > 0) { distinct += 1; sumSq += c * c; if (c > maxC) maxC = c }
      k += 1
    }
    if (other != null) {
      val it = other.values().iterator()
      while (it.hasNext) {
        val c: Long = it.next()
        distinct += 1; sumSq += c * c; if (c > maxC) maxC = c
      }
    }
    Array(n, distinct, sumSq, maxC)
  }
}

/** Codegen column: array<long> [n_cp, distinct_cp, Σcount², max count]. */
case class CharStatsExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_char_stats"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(CharStatsOps.charStats(v.asInstanceOf[UTF8String]))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.CharStatsOps.charStats($c))")

  override protected def withNewChildInternal(c: Expression): CharStatsExpr =
    copy(child = c)
}

object CharStatsExprs {
  def charStats(text: Column): Column =
    GraftColumnBridge.column(CharStatsExpr(GraftColumnBridge.expression(text)))
}
