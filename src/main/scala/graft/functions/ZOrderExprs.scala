package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) curve kernels.
  *
  * Sorting a table by the interleaved bits of two key columns places
  * rows close in BOTH dimensions into the same file ranges — the
  * standard multi-column data-skipping layout (Delta/Iceberg OPTIMIZE
  * ZORDER BY): after a z-ordered write, per-file min/max stats are
  * narrow for every interleaved column, so a scan filtered on either
  * key prunes most files. At 100 TB this is the difference between a
  * full scan and reading a few percent for selective multi-key
  * workloads.
  */
object ZOrderOps {

  /** Spread the low 32 bits of `v` to the even bit positions of a long
    * — the classic magic-number Morton spread (each step doubles the
    * gap between occupied bits). */
  def spread32(v: Long): Long = {
    var x = v & 0xffffffffL
    x = (x | (x << 16)) & 0x0000ffff0000ffffL
    x = (x | (x << 8)) & 0x00ff00ff00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0f0f0f0f0fL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** Interleave the low 32 bits of `a` (even positions) and `b` (odd
    * positions) into one 64-bit z-value. */
  def interleave(a: Long, b: Long): Long =
    spread32(a) | (spread32(b) << 1)
}

/** `z = interleave(a, b)` over the LOW 32 BITS of each input — the
  * z-value is a 64-bit sort key, so each dimension contributes at most
  * 32 bits; callers with wider domains map them down first (bucket,
  * rank, or truncate — for layout purposes the low bits of a uniform
  * key are exactly as good).
  *
  * Codegen calls the same static kernel the interpreted path uses, so
  * eval ≡ codegen by construction. Null in either input → null z (a
  * row with no key has no place on the curve; sort it with nulls_first
  * or filter, but don't invent a position). */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == LongType && right.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(
        s"graft_zorder needs (bigint, bigint), got " +
          s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ZOrderOps.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrderOps.interleave($a, $b)")

  override def prettyName: String = "graft_zorder"

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
}

object ZOrderExprs {
  /** Column API: 64-bit z-value of two long keys (low 32 bits each). */
  def zorder(a: Column, b: Column): Column =
    GraftColumnBridge.column(InterleaveBits(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
