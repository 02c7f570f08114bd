package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The BPE merge-application kernel: one greedy left-to-right pass over
  * a symbol array, replacing each non-overlapping adjacent occurrence
  * of (left, right) with the single merged symbol `left ++ sep ++
  * right` — the standard merge step of byte-pair-encoding tokenizer
  * training. Doc-local (no shuffle); the iterative trainer
  * ([[graft.operators.Vocab.bpeMerges]]) applies it once per round.
  */
object BpeOps {

  def mergeAdjacent(arr: ArrayData, l: UTF8String, r: UTF8String,
      sep: UTF8String): ArrayData = {
    val n = arr.numElements()
    val out = new java.util.ArrayList[UTF8String](n)
    val merged = UTF8String.concat(l, sep, r)
    var i = 0
    while (i < n) {
      val cur = arr.getUTF8String(i)
      val isPair = i + 1 < n && cur != null && cur.equals(l) && {
        val nx = arr.getUTF8String(i + 1)
        nx != null && nx.equals(r)
      }
      if (isPair) { out.add(merged); i += 2 }
      else { out.add(cur); i += 1 }
    }
    new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
  }

  /** Apply a whole merge table in rank order (see [[BpeEncodeExpr]]).
    * `lefts`/`rights` are rank-aligned arrays. */
  def encodeAll(arr: ArrayData, lefts: ArrayData, rights: ArrayData,
      sep: UTF8String): ArrayData = {
    var cur = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = arr.getUTF8String(i); i += 1 }
    val m = lefts.numElements()
    var k = 0
    while (k < m && cur.length >= 2) {
      val l = lefts.getUTF8String(k)
      val r = rights.getUTF8String(k)
      val merged = UTF8String.concat(l, sep, r)
      val out = new java.util.ArrayList[UTF8String](cur.length)
      var changed = false
      i = 0
      while (i < cur.length) {
        val isPair = i + 1 < cur.length && cur(i) != null &&
          cur(i).equals(l) && cur(i + 1) != null && cur(i + 1).equals(r)
        if (isPair) { out.add(merged); i += 2; changed = true }
        else { out.add(cur(i)); i += 1 }
      }
      if (changed) cur = out.toArray(new Array[UTF8String](out.size))
      k += 1
    }
    new GenericArrayData(cur)
  }
}

/** Codegen column: apply one BPE merge (left, right) to a symbol array.
  * Children: (symbols array<string>, left string, right string); the
  * separator is a literal parameter. */
case class MergeAdjacentExpr(arr: Expression, left: Expression,
    right: Expression, sep: String) extends TernaryExpression {

  override def first: Expression = arr
  override def second: Expression = left
  override def third: Expression = right

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_merge"

  private val sepU = UTF8String.fromString(sep)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = (arr.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }) && left.dataType == StringType && right.dataType == StringType
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, string, string), got " +
        children.map(_.dataType.sql).mkString(", "))
  }

  override def nullSafeEval(a: Any, l: Any, r: Any): Any =
    BpeOps.mergeAdjacent(a.asInstanceOf[ArrayData],
      l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], sepU)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepU,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, (a, l, r) =>
      s"graft.functions.BpeOps.mergeAdjacent($a, $l, $r, $sepRef)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): MergeAdjacentExpr =
    copy(arr = f, left = s, right = t)
}

/** Full-table BPE application: apply every merge of a trained table in
  * rank order, each as one greedy leftmost non-overlapping pass — the
  * Sennrich ENCODE, and exactly the trainer's own application step, so
  * encoding the training corpus reproduces the trainer's final symbol
  * state. O(nMerges · len) per doc; a rank-heap encoder is the
  * constant-factor upgrade when nMerges reaches real vocabulary sizes,
  * but the sequential pass IS the semantics either way. */
case class BpeEncodeExpr(arr: Expression, lefts: Expression,
    rights: Expression, sep: String) extends TernaryExpression {

  override def first: Expression = arr
  override def second: Expression = lefts
  override def third: Expression = rights

  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_bpe_encode"

  private val sepU = UTF8String.fromString(sep)

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<string>, array<string>, " +
        s"array<string>), got " + children.map(_.dataType.sql).mkString(", "))
  }

  override def nullSafeEval(a: Any, l: Any, r: Any): Any =
    BpeOps.encodeAll(a.asInstanceOf[ArrayData],
      l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData], sepU)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sepRef = ctx.addReferenceObj("sep", sepU,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, (a, l, r) =>
      s"graft.functions.BpeOps.encodeAll($a, $l, $r, $sepRef)")
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): BpeEncodeExpr =
    copy(arr = f, lefts = s, rights = t)
}

object BpeExprs {
  def mergeAdjacent(arr: Column, left: Column, right: Column,
      sep: String): Column =
    GraftColumnBridge.column(MergeAdjacentExpr(
      GraftColumnBridge.expression(arr),
      GraftColumnBridge.expression(left),
      GraftColumnBridge.expression(right), sep))

  def encode(arr: Column, lefts: Column, rights: Column,
      sep: String): Column =
    GraftColumnBridge.column(BpeEncodeExpr(
      GraftColumnBridge.expression(arr),
      GraftColumnBridge.expression(lefts),
      GraftColumnBridge.expression(rights), sep))
}
