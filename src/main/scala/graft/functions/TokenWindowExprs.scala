package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Token-window rolling fingerprints for exact-substring span dedup
  * ([[graft.operators.SpanDedup]]).
  *
  * The declarative formulation — `xxhash64(slice(tokenHashes, p, L))`
  * per position — recomputes an L-element hash per window: O(n·L) work
  * per document, which at L = 50 (the Lee-et-al granularity) is 50
  * corpus passes' worth of hashing. This kernel computes the per-token
  * hashes once and rolls a degree-(L-1) polynomial over them —
  * `fp(p+1) = (fp(p) − h(p)·B^(L−1))·B + h(p+L)` in 2⁶⁴ arithmetic —
  * so every document costs O(n) regardless of the window length.
  *
  * Fingerprint equality stands in for window-string equality (the same
  * contract as every hashed-dedup kernel here: false merges at ~2⁻⁶⁴
  * per pair); the DuckDB oracle replays the operator on literal window
  * STRINGS, so the hash function needs no cross-engine twin.
  *
  * Tokenization matches `functions.split(text, " ")` exactly (single
  * space, trailing empties kept) — the rewrite side of SpanDedup splits
  * with that built-in and positions must align 1:1.
  */
object TokenWindowOps {
  private final val B = 0x9E3779B97F4A7C16L | 1L // odd ⇒ invertible mod 2⁶⁴

  private def mix64(v: Long): Long = {
    var z = v
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Per-position fingerprints of every length-`L` token window of `s`;
    * empty array when the doc has fewer than `L` tokens. Slot `i` (0
    * based) is the window starting at token `i`. */
  def tokenWindowFps(s: UTF8String, L: Int): Array[Long] = {
    val str = s.toString
    // token hashes in one pass; split semantics = split(text, " ") with
    // limit -1 (trailing empty strings kept)
    var nTokens = 1
    var i = 0
    while (i < str.length) {
      if (str.charAt(i) == ' ') nTokens += 1
      i += 1
    }
    if (nTokens < L) return Array.emptyLongArray
    val h = new Array[Long](nTokens)
    var t = 0
    var acc = 1125899906842597L
    var len = 0
    i = 0
    while (i < str.length) {
      val c = str.charAt(i)
      if (c == ' ') {
        h(t) = mix64(acc ^ len); t += 1
        acc = 1125899906842597L; len = 0
      } else {
        acc = acc * 31 + c; len += 1
      }
      i += 1
    }
    h(t) = mix64(acc ^ len)

    // rolling polynomial of degree L-1 over the token hashes
    var powL1 = 1L // B^(L-1)
    i = 1
    while (i < L) { powL1 *= B; i += 1 }
    val out = new Array[Long](nTokens - L + 1)
    var fp = 0L
    i = 0
    while (i < L) { fp = fp * B + h(i); i += 1 }
    out(0) = fp
    i = 1
    while (i < out.length) {
      fp = (fp - h(i - 1) * powL1) * B + h(i + L - 1)
      out(i) = fp
      i += 1
    }
    out
  }
}

/** `array<long>` of per-position window fingerprints (see
  * [[TokenWindowOps.tokenWindowFps]]); empty for docs shorter than `L`
  * tokens, null only for null input. */
case class TokenWindowFps(child: Expression, windowTokens: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_window_fps"
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    new GenericArrayData(
      TokenWindowOps.tokenWindowFps(v.asInstanceOf[UTF8String], windowTokens))
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
      |  graft.functions.TokenWindowOps.tokenWindowFps($c, $windowTokens));
    """.stripMargin)
  override protected def withNewChildInternal(c: Expression): TokenWindowFps =
    copy(child = c)
}

object TokenWindowExprs {
  def tokenWindowFps(text: Column, windowTokens: Int): Column =
    GraftColumnBridge.column(
      TokenWindowFps(GraftColumnBridge.expression(text), windowTokens))
}
