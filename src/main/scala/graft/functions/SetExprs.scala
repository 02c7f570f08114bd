package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, TypeUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** Intersection cardinality of two SORTED, null-free, duplicate-free
  * arrays, by linear merge.
  *
  * Jaccard verification evaluates an intersection per candidate pair —
  * the hottest loop of the set-similarity joins. The built-in
  * `array_intersect` builds a hash set of one side per row-pair
  * (allocation + full-width hashing of every element); over pre-sorted
  * arrays a merge does at most |a|+|b| comparisons that short-circuit on
  * the first differing byte, allocates nothing, and returns only the
  * count (the verify path never needs the intersection's elements).
  *
  * Caller contract: both arrays ascending-sorted (`sort_array`),
  * no nulls, no duplicates — which ngram/collect_set outputs satisfy.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b =>
      TypeUtils.checkForOrderingExpr(a, prettyName)
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of the same orderable type, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val c = ordering.compare(x.get(i, elemType), y.get(j, elemType))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val jt = CodeGenerator.javaType(elemType)
      val getA = CodeGenerator.getValue(a, elemType, i)
      val getB = CodeGenerator.getValue(b, elemType, j)
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |final int ${i}N = $a.numElements();
         |final int ${j}N = $b.numElements();
         |while ($i < ${i}N && $j < ${j}N) {
         |  $jt $va = $getA;
         |  $jt $vb = $getB;
         |  int $c = ${ctx.genComp(elemType, va, vb)};
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Jaccard of two SORTED, null-free, duplicate-free arrays when it is
  * ≥ `threshold`, else null — one merge pass for both the test and the
  * value.
  *
  * Why thresholding lives inside the expression: a plain
  * `filter(jaccard >= t)` over a projected jaccard column gets inlined
  * by predicate pushdown into the join condition, so the merge runs once
  * per occurrence — observed three evaluations per candidate pair
  * (numerator + denominator in the pushed condition, plus the output
  * projection). With the test fused into one null-producing expression,
  * the pushed `IsNotNull` costs a single merge per candidate, and only
  * surviving pairs pay a second merge in the output projection.
  *
  * Same caller contract as [[SortedIntersectSize]]; empty-vs-empty
  * union yields null (no meaningful Jaccard), matching SQL NULL-division
  * semantics.
  */
case class JaccardGE(left: Expression, right: Expression, threshold: Double)
    extends BinaryExpression {

  // A Jaccard similarity is always in [0,1]; bounding the threshold keeps
  // the generated Java literal valid (NaN/Infinity don't print as literals)
  // and keeps the codegen path's -1.0 empty-union sentinel from ever
  // satisfying the comparison.
  require(threshold >= 0.0 && threshold <= 1.0,
    s"graft_jaccard_ge threshold must be in [0,1], got $threshold")

  override def dataType: DataType = org.apache.spark.sql.types.DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_jaccard_ge"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(a, _), ArrayType(b, _)) if a == b =>
        TypeUtils.checkForOrderingExpr(a, prettyName)
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two arrays of the same orderable type, " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val c = ordering.compare(x.get(i, elemType), y.get(j, elemType))
      if (c == 0) { n += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    val uni = nx + ny - n
    if (uni == 0) null
    else {
      val jac = n.toDouble / uni.toDouble
      if (jac >= threshold) jac else null
    }
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val uni = ctx.freshName("uni")
      val jac = ctx.freshName("jac")
      val jt = CodeGenerator.javaType(elemType)
      val getA = CodeGenerator.getValue(a, elemType, i)
      val getB = CodeGenerator.getValue(b, elemType, j)
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |final int ${i}N = $a.numElements();
         |final int ${j}N = $b.numElements();
         |while ($i < ${i}N && $j < ${j}N) {
         |  $jt $va = $getA;
         |  $jt $vb = $getB;
         |  int $c = ${ctx.genComp(elemType, va, vb)};
         |  if ($c == 0) { $n++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |final int $uni = ${i}N + ${j}N - $n;
         |final double $jac = $uni == 0 ? -1.0 : ((double) $n) / $uni;
         |if ($jac >= $threshold) { ${ev.value} = $jac; }
         |else { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaccardGE =
    copy(left = newLeft, right = newRight)
}

/** Occurrence count of `left`'s elements inside the sorted dup-free
  * set `right` — [[SortedIntersectSize]]'s multiplicity-aware sibling:
  * on a match only the LEFT cursor advances, so each duplicate left
  * element recounts against the same right entry.
  *
  * The membership-statistics kernel for frozen-dictionary passes
  * (vocabulary coverage, OOV rates): the dictionary rides the plan as
  * a broadcast single-row array and every document answers "how many
  * of my token OCCURRENCES are in the dictionary" in one doc-local
  * merge — no token-stream explode, no join, nothing corpus-sized ever
  * shuffles.
  *
  * Caller contract: `left` ascending-sorted, nulls absent, duplicates
  * ALLOWED; `right` ascending-sorted, null-free, duplicate-free. */
case class SortedContainsCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_contains_count"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b =>
      TypeUtils.checkForOrderingExpr(a, prettyName)
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of the same orderable type, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var n = 0
    while (i < nx && j < ny) {
      val c = ordering.compare(x.get(i, elemType), y.get(j, elemType))
      if (c == 0) { n += 1; i += 1 } // left-only advance: count dups
      else if (c < 0) i += 1
      else j += 1
    }
    n
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      val va = ctx.freshName("va")
      val vb = ctx.freshName("vb")
      val jt = CodeGenerator.javaType(elemType)
      val getA = CodeGenerator.getValue(a, elemType, i)
      val getB = CodeGenerator.getValue(b, elemType, j)
      s"""
         |int $i = 0; int $j = 0; int $n = 0;
         |final int ${i}N = $a.numElements();
         |final int ${j}N = $b.numElements();
         |while ($i < ${i}N && $j < ${j}N) {
         |  $jt $va = $getA;
         |  $jt $vb = $getB;
         |  int $c = ${ctx.genComp(elemType, va, vb)};
         |  if ($c == 0) { $n++; $i++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $n;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedContainsCount =
    copy(left = newLeft, right = newRight)
}

/** Shared merge/search helpers for the set kernels (static call targets
  * for both interpreted eval and generated code). */
object SetOps {
  /** Per-element 1-based rank of `x`'s elements in the sorted dup-free
    * dictionary `dict`, by binary search; absent elements map to -1. */
  def sortedLookupIds(x: ArrayData, dict: ArrayData,
      ordering: Ordering[Any], elemType: DataType): ArrayData = {
    val n = x.numElements()
    val m = dict.numElements()
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val v = x.get(i, elemType)
      var lo = 0
      var hi = m - 1
      var found = -1
      while (lo <= hi && found < 0) {
        val mid = (lo + hi) >>> 1
        val c = ordering.compare(dict.get(mid, elemType), v)
        if (c == 0) found = mid + 1
        else if (c < 0) lo = mid + 1
        else hi = mid - 1
      }
      out(i) = found
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Per-element 1-based rank of `left`'s elements in the sorted
  * dup-free dictionary `right`, by binary search — the vocabulary
  * id-assignment kernel: with token ids DEFINED as the 1-based rank in
  * the sorted symbol universe, a document's symbol array maps to its
  * id array in one doc-local pass against a broadcast dictionary (no
  * token-stream explode, no join, O(n log V) per doc). Symbols absent
  * from the dictionary map to -1 (the UNK id).
  *
  * Caller contract: `right` ascending-sorted (engine order), null-free,
  * duplicate-free; `left` any order, duplicates allowed, null-free. */
case class SortedLookupIds(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType =
    ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_sorted_lookup_ids"

  private def elemType: DataType =
    left.dataType.asInstanceOf[ArrayType].elementType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(a, _), ArrayType(b, _)) if a == b =>
      TypeUtils.checkForOrderingExpr(a, prettyName)
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two arrays of the same orderable type, " +
        s"got ${left.dataType.sql} and ${right.dataType.sql}")
  }

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(elemType)

  override def nullSafeEval(a: Any, b: Any): Any =
    SetOps.sortedLookupIds(a.asInstanceOf[ArrayData],
      b.asInstanceOf[ArrayData], ordering, elemType)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ordRef = ctx.addReferenceObj("ordering", ordering,
      "scala.math.Ordering")
    val etRef = ctx.addReferenceObj("elemType", elemType,
      classOf[DataType].getName)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.SetOps.sortedLookupIds(" +
        s"$a, $b, $ordRef, $etRef);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedLookupIds =
    copy(left = newLeft, right = newRight)
}

object SetExprs {
  /** Column API for [[SortedIntersectSize]]. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectSize(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[SortedContainsCount]]. */
  def sortedContainsCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedContainsCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[SortedLookupIds]]. */
  def sortedLookupIds(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedLookupIds(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[JaccardGE]]. */
  def jaccardGE(a: Column, b: Column, threshold: Double): Column =
    GraftColumnBridge.column(JaccardGE(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      threshold))
}
