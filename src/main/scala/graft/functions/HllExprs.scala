package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType, LongType}

/** HyperLogLog sketches as FIRST-CLASS relational values [Flajolet et
  * al., "HyperLogLog: the analysis of a near-optimal cardinality
  * estimation algorithm", 2007].
  *
  * Spark's `approx_count_distinct` answers one query and throws the
  * sketch away. At 100 TB the sketch ITSELF is the asset: build one
  * per partition/day/source once (one scan), persist the binary
  * column, and answer every later cardinality question — per-group,
  * rolled up across arbitrary group subsets, or cumulative over time —
  * by merging kilobyte sketches instead of rescanning the corpus.
  * Register-wise max is commutative/associative/idempotent, so merges
  * are re-orderable and replay-safe, and the estimate is a
  * deterministic function of the registers — byte-stable output no
  * matter how Spark partitions the build.
  *
  * Serialized layout: 1 header byte holding the precision p, then
  * m = 2^p register bytes. Inputs are 64-bit hashes (callers pass
  * `xxhash64(col)` — keeps the sketch input-type-agnostic): index =
  * top p bits, rank = leading zeros of the remaining 64-p bits + 1.
  */
object HllOps {
  val MinP = 4
  val MaxP = 16

  def emptySketch(p: Int): Array[Byte] = {
    val a = new Array[Byte](1 + (1 << p))
    a(0) = p.toByte
    a
  }

  def update(sketch: Array[Byte], hash: Long): Unit = {
    val p = sketch(0).toInt
    val idx = (hash >>> (64 - p)).toInt
    val w = hash << p
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > sketch(1 + idx)) sketch(1 + idx) = rank.toByte
  }

  /** Register-wise max. Both sketches must share p. */
  def mergeInto(into: Array[Byte], from: Array[Byte]): Unit = {
    require(into(0) == from(0),
      s"hll merge: precision mismatch (${into(0)} vs ${from(0)})")
    var i = 1
    while (i < into.length) {
      if (from(i) > into(i)) into(i) = from(i)
      i += 1
    }
  }

  /** Raw HLL estimate with the standard small-range (linear counting)
    * correction. Deterministic: a fixed-order loop over registers. */
  def estimate(sketch: Array[Byte]): Double = {
    val p = sketch(0).toInt
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    var invSum = 0.0
    var zeros = 0
    var i = 1
    while (i <= m) {
      val r = sketch(i).toInt
      invSum += java.lang.Math.scalb(1.0, -r) // exact powers of two
      if (r == 0) zeros += 1
      i += 1
    }
    val e = alpha * m * m / invSum
    if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) else e
  }
}

/** Build an HLL sketch over a column of 64-bit hashes. Null inputs are
  * skipped (a null contributes no identity). Output: serialized sketch
  * (binary), 2^p + 1 bytes. */
case class HllSketchAgg(child: Expression, p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  // analysis-time contract: an INT hash gets an implicit cast; an
  // incompatible column fails resolution, not execution
  override def inputTypes: Seq[DataType] = Seq(LongType)

  require(p >= HllOps.MinP && p <= HllOps.MaxP,
    s"HllSketchAgg: p must be in [${HllOps.MinP},${HllOps.MaxP}], got $p")

  override def createAggregationBuffer(): Array[Byte] = HllOps.emptySketch(p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllOps.update(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    HllOps.mergeInto(b1, b2)
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_sketch"

  override def withNewMutableAggBufferOffset(offset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** Merge a column of serialized sketches into one — the rollup
  * aggregate over persisted sketch relations. Null sketches are
  * skipped; all non-null inputs must share the precision `p`. */
case class HllMergeAgg(child: Expression, p: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] with ImplicitCastInputTypes {

  // only a serialized sketch column is a valid merge input
  override def inputTypes: Seq[DataType] = Seq(BinaryType)

  require(p >= HllOps.MinP && p <= HllOps.MaxP,
    s"HllMergeAgg: p must be in [${HllOps.MinP},${HllOps.MaxP}], got $p")

  override def createAggregationBuffer(): Array[Byte] = HllOps.emptySketch(p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) HllOps.mergeInto(buf, v.asInstanceOf[Array[Byte]])
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    HllOps.mergeInto(b1, b2)
    b1
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hll_merge"

  override def withNewMutableAggBufferOffset(offset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllMergeAgg =
    copy(child = newChild)
}

/** Cardinality estimate of a serialized sketch. Not codegen'd — it
  * runs once per GROUP (sketch), not once per input row, so there is
  * no hot path to widen. */
case class HllEstimate(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == BinaryType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"graft_hll_estimate needs binary, got " +
        child.dataType.simpleString)

  override protected def nullSafeEval(s: Any): Any =
    HllOps.estimate(s.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"graft.functions.HllOps.estimate($s)")

  override def prettyName: String = "graft_hll_estimate"
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}

object HllExprs {
  /** Sketch of a pre-hashed (`xxhash64`) column. */
  def hllSketch(hashed: Column, p: Int = 12): Column =
    GraftColumnBridge.column(
      HllSketchAgg(GraftColumnBridge.expression(hashed), p)
        .toAggregateExpression())

  /** Rollup merge of serialized sketches. */
  def hllMerge(sketch: Column, p: Int = 12): Column =
    GraftColumnBridge.column(
      HllMergeAgg(GraftColumnBridge.expression(sketch), p)
        .toAggregateExpression())

  /** Estimated cardinality of a serialized sketch. */
  def hllEstimate(sketch: Column): Column =
    GraftColumnBridge.column(HllEstimate(
      GraftColumnBridge.expression(sketch)))
}
