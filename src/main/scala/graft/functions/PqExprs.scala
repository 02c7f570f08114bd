package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** Product-quantization kernels (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", PAMI 2011): vectors split into `m`
  * subspaces, each encoded as its nearest of `ksub` per-subspace
  * centroids — a vector becomes m small codes (here m·4 bytes vs
  * dim·4), and query-to-vector similarity is computed from a per-query
  * lookup table without touching the original vectors (ADC —
  * asymmetric distance computation).
  *
  * Codebooks are flattened double arrays riding the generated code as
  * reference objects — the "constants ride the plan" discipline of the
  * IVF centroids; all three kernels are doc-local codegen projections,
  * so encoding and scoring shuffle nothing.
  */
object PqOps {

  /** Nearest-centroid code per subspace. cb layout: [j][c][d] flattened. */
  def encode(v: ArrayData, cb: Array[Double], m: Int, ksub: Int,
      dsub: Int): ArrayData = {
    val codes = new Array[Int](m)
    var j = 0
    while (j < m) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var s = 0.0
        var d = 0
        while (d < dsub) {
          val diff = v.getDouble(j * dsub + d) - cb(base + d)
          s += diff * diff
          d += 1
        }
        if (s < bestD) { bestD = s; best = c }
        c += 1
      }
      codes(j) = best
      j += 1
    }
    new GenericArrayData(codes)
  }

  /** ADC lookup table for one query: dot(q_subⱼ, centroidⱼ,c) for every
    * (j, c). */
  def table(q: ArrayData, cb: Array[Double], m: Int, ksub: Int,
      dsub: Int): ArrayData = {
    val t = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      var c = 0
      while (c < ksub) {
        val base = (j * ksub + c) * dsub
        var s = 0.0
        var d = 0
        while (d < dsub) { s += q.getDouble(j * dsub + d) * cb(base + d); d += 1 }
        t(j * ksub + c) = s
        c += 1
      }
      j += 1
    }
    new GenericArrayData(t)
  }

  /** Approximate cosine from codes + the query's table: Σⱼ tbl[j][code]
    * over (‖q‖ · ‖x̂‖), with ‖x̂‖² = Σⱼ sqn[j][code]. Null when either
    * norm is zero. Boxed Double so the null is expressible. */
  def cosine(codes: ArrayData, tbl: ArrayData, qnorm: Double,
      sqn: Array[Double], m: Int, ksub: Int): java.lang.Double = {
    var dot = 0.0
    var n2 = 0.0
    var j = 0
    while (j < m) {
      val c = codes.getInt(j)
      dot += tbl.getDouble(j * ksub + c)
      n2 += sqn(j * ksub + c)
      j += 1
    }
    val denom = qnorm * math.sqrt(n2)
    if (denom <= 0.0) null else java.lang.Double.valueOf(dot / denom)
  }
}

/** array<double> vector → array<int> PQ codes. */
case class PqEncodeExpr(child: Expression, cb: Array[Double], m: Int,
    ksub: Int, dsub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PqOps.encode(v.asInstanceOf[ArrayData], cb, m, ksub, dsub)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqOps.encode($c, $cbRef, $m, $ksub, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): PqEncodeExpr =
    copy(child = c)
}

/** array<double> query → array<double> ADC table (m·ksub entries). */
case class PqTableExpr(child: Expression, cb: Array[Double], m: Int,
    ksub: Int, dsub: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_table"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<double>, got ${t.sql}")
  }

  override def nullSafeEval(v: Any): Any =
    PqOps.table(v.asInstanceOf[ArrayData], cb, m, ksub, dsub)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("cb", cb, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqOps.table($c, $cbRef, $m, $ksub, $dsub)")
  }
  override protected def withNewChildInternal(c: Expression): PqTableExpr =
    copy(child = c)
}

/** (codes, table, qnorm) → approximate cosine (nullable double). */
case class PqCosineExpr(codes: Expression, tbl: Expression,
    qnorm: Expression, sqn: Array[Double], m: Int, ksub: Int)
    extends TernaryExpression {
  override def first: Expression = codes
  override def second: Expression = tbl
  override def third: Expression = qnorm

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pq_cosine"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (codes.dataType match {
      case ArrayType(IntegerType, _) => true
      case _ => false
    }) && (tbl.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }) && qnorm.dataType == DoubleType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<int>, array<double>, double), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def nullSafeEval(c: Any, t: Any, n: Any): Any =
    PqOps.cosine(c.asInstanceOf[ArrayData], t.asInstanceOf[ArrayData],
      n.asInstanceOf[Double], sqn, m, ksub)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sqnRef = ctx.addReferenceObj("sqn", sqn, "double[]")
    nullSafeCodeGen(ctx, ev, (c, t, n) => s"""
      |java.lang.Double r = graft.functions.PqOps.cosine(
      |  $c, $t, $n, $sqnRef, $m, $ksub);
      |if (r == null) { ${ev.isNull} = true; }
      |else { ${ev.value} = r.doubleValue(); }
    """.stripMargin)
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PqCosineExpr =
    copy(codes = f, tbl = s, qnorm = t)
}

object PqExprs {
  def encode(v: Column, cb: Array[Double], m: Int, ksub: Int,
      dsub: Int): Column =
    GraftColumnBridge.column(PqEncodeExpr(
      GraftColumnBridge.expression(v), cb, m, ksub, dsub))
  def table(q: Column, cb: Array[Double], m: Int, ksub: Int,
      dsub: Int): Column =
    GraftColumnBridge.column(PqTableExpr(
      GraftColumnBridge.expression(q), cb, m, ksub, dsub))
  def cosine(codes: Column, tbl: Column, qnorm: Column,
      sqn: Array[Double], m: Int, ksub: Int): Column =
    GraftColumnBridge.column(PqCosineExpr(
      GraftColumnBridge.expression(codes),
      GraftColumnBridge.expression(tbl),
      GraftColumnBridge.expression(qnorm), sqn, m, ksub))
}
