package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric arrays.
  *
  * Embedding similarity is the hottest loop in the similarity/dedup
  * operators: a pairwise cosine evaluates 3 dot products per candidate
  * pair. The built-in formulation `aggregate(zip_with(a, b, _ * _), ...)`
  * is correct but runs interpreted (higher-order-function lambdas are off
  * the whole-stage-codegen path) and allocates an intermediate array per
  * row. This expression generates a tight primitive loop instead —
  * left-to-right double accumulation, so results are bit-identical to the
  * sequential HOF formulation and to DuckDB's `list_sum(list_transform)`.
  *
  * Null semantics mirror `zip_with`-based code: null input array, length
  * mismatch, or a null element yields null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  // Null is possible even with non-null children (length mismatch, null
  // element): without this override, non-nullable inputs make
  // nullSafeCodeGen drop the isNull declaration the result code assigns —
  // the generated class fails to compile and the whole stage silently
  // falls back to interpreted execution.
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dot"

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = {
    // decimals excluded: the generated (double)(...) cast is invalid Java
    // for Decimal element values — callers cast to double first
    def ok(e: Expression): Boolean = e.dataType match {
      case ArrayType(_: DecimalType, _) => false
      case ArrayType(_: NumericType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two non-decimal numeric arrays, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    val (lt, rt) = (elemType(left), elemType(right))
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += toDouble(x, i, lt) * toDouble(y, i, rt)
      i += 1
    }
    acc
  }

  private def toDouble(a: ArrayData, i: Int, t: DataType): Double = t match {
    case DoubleType => a.getDouble(i)
    case FloatType => a.getFloat(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case LongType => a.getLong(i).toDouble
    case ShortType => a.getShort(i).toDouble
    case ByteType => a.getByte(i).toDouble
    case d: DecimalType => a.getDecimal(i, d.precision, d.scale).toDouble
    case other => throw new IllegalStateException(s"non-numeric $other")
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val getA = CodeGenerator.getValue(a, elemType(left), i)
      val getB = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $acc += (double)($getA) * (double)($getB);
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object VectorExprs {
  /** Column API for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
