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

/** Static kernel for the sign random projection. The ±1 matrix is the
  * engine constant of `Similarity.rpSign` (two affine+square rounds mod
  * 2^31−1, parity), precomputed once per (dIn, kOut) and cached; the
  * projection itself is the identical IEEE arithmetic the higher-order
  * `aggregate` formulation evaluated — per output dim a left fold of
  * (widened element × ±1.0), then ONE division by √kOut — so replacing
  * the interpreted HOF with this kernel changes nothing bit-wise, only
  * the 16×64 interpreted lambda evaluations per row. */
object RpOps {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, Array[Double]]()

  /** Row-major [i*kOut + j] sign matrix — exact-BIGINT arithmetic the
    * SQL oracle replays literally. */
  def signMatrix(dIn: Int, kOut: Int): Array[Double] =
    cache.computeIfAbsent((dIn.toLong << 32) | kOut.toLong, _ => {
      val p = 2147483647L
      val m = new Array[Double](dIn * kOut)
      var i = 0
      while (i < dIn) {
        var j = 0
        while (j < kOut) {
          val x = i.toLong * 131L + j.toLong + 17L
          val y = (x * 48271L + 11L) % p
          val z = (y * y) % p
          val w = (z * 48271L + 17L) % p
          val u = (w * w) % p
          m(i * kOut + j) = if (u % 2L == 1L) -1.0 else 1.0
          j += 1
        }
        i += 1
      }
      m
    })

  private def project(v: ArrayData, dIn: Int, kOut: Int,
      get: Int => Double): ArrayData = {
    val n = v.numElements()
    if (n != dIn) throw new IllegalArgumentException(
      s"randomProjectVec: embedding dim mismatch, expected $dIn got $n")
    val s = signMatrix(dIn, kOut)
    val scale = math.sqrt(kOut.toDouble)
    val out = new Array[Double](kOut)
    var j = 0
    while (j < kOut) {
      var acc = 0.0
      var i = 0
      while (i < dIn) {
        if (v.isNullAt(i)) throw new IllegalArgumentException(
          s"randomProjectVec: null element at position $i")
        acc += get(i) * s(i * kOut + j)
        i += 1
      }
      out(j) = acc / scale
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def projectFloat(v: ArrayData, dIn: Int, kOut: Int): ArrayData =
    project(v, dIn, kOut, i => v.getFloat(i).toDouble)

  def projectDouble(v: ArrayData, dIn: Int, kOut: Int): ArrayData =
    project(v, dIn, kOut, i => v.getDouble(i))
}

/** Codegen column: the whole `kOut`-dim sign projection of one vector
  * in a single primitive pass (see [[RpOps]]). Null vector → null;
  * width mismatch or a null ELEMENT fails loudly — a corrupt embedding
  * must not silently vanish from downstream rankings. */
case class RandomProjectExpr(child: Expression, dIn: Int, kOut: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType,
    containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_random_project"

  private def fn: String = child.dataType match {
    case ArrayType(FloatType, _) => "projectFloat"
    case _ => "projectDouble"
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float> or array<double>, got " +
        other.sql)
  }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (fn == "projectFloat") RpOps.projectFloat(a, dIn, kOut)
    else RpOps.projectDouble(a, dIn, kOut)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.RpOps.$fn($c, $dIn, $kOut)")

  override protected def withNewChildInternal(
      newChild: Expression): RandomProjectExpr = copy(child = newChild)
}

object VectorExprs {
  /** Column API for [[DotProduct]]. */
  def dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[RandomProjectExpr]].
    *
    * `kOut` is capped at 131: the sign-matrix seed is
    * `x = 131*i + j + 17`, so `sign(i, j) == sign(i-1, j+131)` — any
    * `kOut > 131` would reuse row-shifted columns, exactly the
    * correlated-matrix degeneracy the quadratic rounds guard against.
    * The cap keeps every (i, j) seed distinct within a matrix. (A JL
    * projection is compressive anyway; an expansion past 131 dims has
    * no use case here, so the cap costs nothing.) */
  def randomProject(v: Column, dIn: Int, kOut: Int): Column = {
    require(kOut > 0 && kOut <= 131,
      s"randomProject: kOut must be in [1, 131] (seed stride — larger " +
        s"kOut would duplicate row-shifted sign columns), got $kOut")
    GraftColumnBridge.column(RandomProjectExpr(
      GraftColumnBridge.expression(v), dIn, kOut))
  }
}
