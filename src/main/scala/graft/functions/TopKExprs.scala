package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded per-group top-k as a mergeable aggregate.
  *
  * The standard plan for "top k rows per group" is a
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC)` window +
  * filter — which shuffles and SORTS every input row. At 100 TB that
  * is the dominant cost of the query: the exchange carries the full
  * fact table and the sort materializes it per task, all to discard
  * everything past rank k.
  *
  * This aggregate keeps a k-bounded min-heap per group instead:
  * partial heaps fill map-side (each partition contributes at most k
  * candidates per group it touches), merge is heap-union-truncate, and
  * the exchange carries ≤ k·|groups| pairs — shuffle volume ∝ OUTPUT,
  * not input, and no sort of the input ever runs (the only sort is the
  * k·log k finalization per group).
  *
  * Determinism: order is (score desc, id asc) — ties on score resolve
  * to the smaller id, so the result set and its order are unique
  * regardless of partitioning and merge order. Null scores and null
  * ids are skipped (a null score has no rank; a null id could not
  * tie-break deterministically).
  *
  * Output: `array<struct<id long, score double>>`, best-first, length
  * ≤ k.
  */
case class TopKPairs(scoreExpr: Expression, idExpr: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.PriorityQueue[TopKPairs.Pair]]
    with BinaryLike[Expression] with ImplicitCastInputTypes {

  require(k >= 1 && k <= 1000000,
    s"TopKPairs: k must be in [1, 1000000], got $k")

  // analysis-time contract: a DECIMAL score or INT id gets an implicit
  // cast; a genuinely incompatible column fails resolution instead of
  // throwing ClassCastException at execution
  override def inputTypes: Seq[DataType] = Seq(DoubleType, LongType)

  private type Buf = java.util.PriorityQueue[TopKPairs.Pair]

  override def left: Expression = scoreExpr
  override def right: Expression = idExpr

  override def createAggregationBuffer(): Buf =
    new Buf(math.min(k, 16) + 1, TopKPairs.WorstFirst)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null)
      offer(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.iterator()
    while (it.hasNext) { val p = it.next(); offer(b1, p.score, p.id) }
    b1
  }

  /** Keep if the heap is not full or the candidate beats the current
    * worst (head of the worst-first heap). */
  private def offer(buf: Buf, score: Double, id: Long): Unit = {
    if (buf.size < k) buf.offer(new TopKPairs.Pair(score, id))
    else {
      val worst = buf.peek()
      if (TopKPairs.beats(score, id, worst.score, worst.id)) {
        buf.poll()
        buf.offer(new TopKPairs.Pair(score, id))
      }
    }
  }

  override def eval(buf: Buf): Any = {
    val arr = buf.toArray(new Array[TopKPairs.Pair](buf.size))
    // best-first output: the inverse of the heap's worst-first order
    java.util.Arrays.sort(arr, TopKPairs.WorstFirst.reversed())
    new GenericArrayData(arr.map(p =>
      new GenericInternalRow(Array[Any](p.id, p.score))))
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val p = it.next()
      out.writeDouble(p.score)
      out.writeLong(p.id)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      buf.offer(new TopKPairs.Pair(in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_top_k_pairs"

  override def withNewMutableAggBufferOffset(offset: Int): TopKPairs =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKPairs =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(scoreExpr = newLeft, idExpr = newRight)
}

object TopKPairs {
  final class Pair(val score: Double, val id: Long)

  /** True when (s1, i1) ranks strictly better: higher score, or equal
    * score and smaller id. Double.compare semantics order NaN above
    * all reals — callers feeding NaN scores get them ranked first,
    * deterministically. */
  private[functions] def beats(s1: Double, i1: Long,
      s2: Double, i2: Long): Boolean = {
    val c = java.lang.Double.compare(s1, s2)
    c > 0 || (c == 0 && i1 < i2)
  }

  /** Heap comparator: the WORST pair at the head, so bounded eviction
    * is a peek/poll. */
  private[functions] val WorstFirst =
    new java.util.Comparator[Pair] {
      override def compare(a: Pair, b: Pair): Int = {
        val c = java.lang.Double.compare(a.score, b.score)
        if (c != 0) c
        else java.lang.Long.compare(b.id, a.id)
      }
    }

  /** Column API: k-bounded best (score desc, id asc) pairs per group. */
  def topK(score: Column, id: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKPairs(GraftColumnBridge.expression(score),
        GraftColumnBridge.expression(id), k).toAggregateExpression())
}
