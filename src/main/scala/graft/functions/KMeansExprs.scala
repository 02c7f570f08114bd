package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The Lloyd assignment kernel: nearest centroid of a (possibly
  * grouped) centroid family for one vector — the hot inner loop of
  * [[graft.operators.KMeans.lloydIterate]], as a codegen expression
  * instead of a `transform`/`zip_with`/`aggregate` lambda chain (the
  * interpreted higher-order path allocates one array per candidate
  * centroid per row; at PQ scale — 32 codebooks × 256 centroids — that
  * was a 30× slowdown, measured).
  *
  * DETERMINISM CONTRACT (must stay bit-identical to the SQL shape the
  * k-means oracle replays — `aggregate(zip_with(x, c, (a,b) ⇒ (a−b)²),
  * 0.0, +)` then `array_position(array_min)`): the squared distance
  * folds (x_d − c_d)² LEFT TO RIGHT from an exact 0.0, and the argmin
  * takes the FIRST index attaining the minimum (strict `<` update).
  * Every operation is the same IEEE-754 sequence, so the kernel's
  * cluster choice equals the higher-order expression's on every input.
  *
  * Centroid matrices ride the generated code as flattened reference
  * objects (the [[PqOps]] codebook discipline) — doc-local projection,
  * nothing shuffles.
  */
object KMeansOps {

  /** Nearest-centroid index within group `g`. `flat` holds every
    * group's centroids back to back ([g][c][d] flattened via `off`);
    * a vector whose length disagrees with its group's dimensionality
    * fails loudly (the validDim contract — silently scoring a
    * mis-sliced vector would corrupt the training sums). */
  def nearest(g: Int, x: ArrayData, flat: Array[Double], off: Array[Int],
      ks: Array[Int], dims: Array[Int]): Int = {
    require(g >= 0 && g < ks.length,
      s"kmeans nearest: group $g out of range [0, ${ks.length})")
    val k = ks(g)
    val dim = dims(g)
    require(x.numElements() == dim,
      s"kmeans nearest: vector length ${x.numElements()} != group-$g " +
        s"dimensionality $dim")
    var best = 0
    var bestD = Double.MaxValue
    var c = 0
    while (c < k) {
      val base = off(g) + c * dim
      var s = 0.0
      var d = 0
      while (d < dim) {
        val diff = x.getDouble(d) - flat(base + d)
        s += diff * diff
        d += 1
      }
      if (s < bestD) { bestD = s; best = c }
      c += 1
    }
    best
  }

  /** Flatten per-group centroid matrices into the (flat, off, ks,
    * dims) quadruple [[nearest]] consumes — shared by the expression
    * route and [[graft.operators.KMeans.lloydIterateLocal]]. */
  def compile(cents: Seq[Seq[Seq[Double]]])
      : (Array[Double], Array[Int], Array[Int], Array[Int]) = {
    val dims = cents.map(g => g.head.length).toArray
    val ks = cents.map(_.length).toArray
    val off = new Array[Int](cents.length)
    var acc = 0
    var g = 0
    while (g < cents.length) {
      off(g) = acc
      acc += ks(g) * dims(g)
      g += 1
    }
    val flat = new Array[Double](acc)
    g = 0
    while (g < cents.length) {
      var c = 0
      while (c < ks(g)) {
        val cent = cents(g)(c)
        require(cent.length == dims(g),
          s"kmeans nearest: group $g centroids must share one " +
            s"dimensionality (${dims(g)}), found ${cent.length}")
        var d = 0
        while (d < dims(g)) {
          flat(off(g) + c * dims(g) + d) = cent(d)
          d += 1
        }
        c += 1
      }
      g += 1
    }
    (flat, off, ks, dims)
  }
}

/** (group id, quantized vector) → nearest-centroid cluster id under
  * that group's centroid matrix. Null-in → null-out. */
case class NearestCentroidExpr(grp: Expression, vec: Expression,
    flat: Array[Double], off: Array[Int], ks: Array[Int],
    dims: Array[Int]) extends BinaryExpression {

  override def left: Expression = grp
  override def right: Expression = vec

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kmeans_nearest"

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = grp.dataType == IntegerType &&
      (vec.dataType match {
        case ArrayType(DoubleType, _) => true
        case _ => false
      })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (int, array<double>), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def nullSafeEval(g: Any, v: Any): Any =
    KMeansOps.nearest(g.asInstanceOf[Int], v.asInstanceOf[ArrayData],
      flat, off, ks, dims)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val flatRef = ctx.addReferenceObj("flat", flat, "double[]")
    val offRef = ctx.addReferenceObj("off", off, "int[]")
    val ksRef = ctx.addReferenceObj("ks", ks, "int[]")
    val dimsRef = ctx.addReferenceObj("dims", dims, "int[]")
    defineCodeGen(ctx, ev, (g, v) =>
      s"graft.functions.KMeansOps.nearest($g, $v, $flatRef, $offRef, " +
        s"$ksRef, $dimsRef)")
  }

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): NearestCentroidExpr =
    copy(grp = l, vec = r)
}

object KMeansExprs {
  /** Column API over per-group centroid matrices (flattened once at
    * construction; bounded — Σ k_g·dim_g doubles, index geometry). */
  def nearest(grp: Column, vec: Column,
      cents: Seq[Seq[Seq[Double]]]): Column = {
    val (flat, off, ks, dims) = KMeansOps.compile(cents)
    GraftColumnBridge.column(NearestCentroidExpr(
      GraftColumnBridge.expression(grp),
      GraftColumnBridge.expression(vec), flat, off, ks, dims))
  }
}
