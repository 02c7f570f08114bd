package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** Static Bloom-filter kernels shared by the interpreted and generated
  * paths (the codegen emits calls into these, so eval ≡ codegen by
  * construction).
  *
  * Layout of a serialized filter: 4 big-endian header bytes holding the
  * hash count k, then the bit words as big-endian longs — m = 64 ×
  * wordCount bits. Membership of a 64-bit key g tests k bit positions
  * derived by double hashing (Kirsch–Mitzenmacher): `(h1 + i·h2) mod m`
  * with h1 = g and h2 an odd avalanche mix of g. Keys here are already
  * xxhash64 gram hashes, so h1 needs no further mixing; h2's finalizer
  * decorrelates the probe stride from the base position. */
object BloomOps {

  /** splitmix64 finalizer — a full-avalanche bijection, forced odd so the
    * double-hashing stride is coprime with any power-of-two word count. */
  def mixOdd(g: Long): Long = {
    var z = g + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    (z ^ (z >>> 31)) | 1L
  }

  /** Set the k probe bits of `g` in `words` (m = 64·words.length). */
  def setBits(words: Array[Long], g: Long, k: Int): Unit = {
    val m = words.length.toLong * 64L
    val h2 = mixOdd(g)
    var h = g
    var i = 0
    while (i < k) {
      val idx = (h & Long.MaxValue) % m
      words((idx >>> 6).toInt) |= (1L << (idx & 63L))
      h += h2
      i += 1
    }
  }

  private def headerK(bytes: Array[Byte]): Int =
    ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)

  private def word(bytes: Array[Byte], w: Int): Long = {
    val o = 4 + w * 8
    ((bytes(o) & 0xffL) << 56) | ((bytes(o + 1) & 0xffL) << 48) |
      ((bytes(o + 2) & 0xffL) << 40) | ((bytes(o + 3) & 0xffL) << 32) |
      ((bytes(o + 4) & 0xffL) << 24) | ((bytes(o + 5) & 0xffL) << 16) |
      ((bytes(o + 6) & 0xffL) << 8) | (bytes(o + 7) & 0xffL)
  }

  /** True iff every probe bit of `g` is set in the serialized filter. */
  def mightContain(bytes: Array[Byte], g: Long): Boolean = {
    val k = headerK(bytes)
    val m = (bytes.length - 4).toLong * 8L
    val h2 = mixOdd(g)
    var h = g
    var i = 0
    while (i < k) {
      val idx = (h & Long.MaxValue) % m
      if ((word(bytes, (idx >>> 6).toInt) & (1L << (idx & 63L))) == 0L)
        return false
      h += h2
      i += 1
    }
    true
  }

  /** Subset of `grams` that might be in the filter (order preserved —
    * a sorted input stays sorted). Never null; possibly empty. */
  def retain(bytes: Array[Byte], grams: ArrayData): ArrayData = {
    val n = grams.numElements()
    val out = new Array[Long](n)
    var w = 0
    var i = 0
    while (i < n) {
      val g = grams.getLong(i)
      if (mightContain(bytes, g)) { out(w) = g; w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Mergeable Bloom filter over 64-bit keys as a single typed imperative
  * aggregate: the buffer is the bit array itself (`long[]`, fixed at
  * `numBits` regardless of input volume), update sets `numHashes` bits
  * per key, merge is a word-wise OR — the textbook distributed Bloom
  * build, one pass, no shuffle beyond the fixed-width partial buffers.
  *
  * Output: the serialized filter ([[BloomOps]] layout) as one binary
  * value — broadcastable at a size chosen by the CALLER (bits/key ≈ 14
  * gives ~0.1% false positives with k = 10), independent of how many
  * keys went in. */
case class BloomBuildAgg(child: Expression, numBits: Long, numHashes: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
    with ImplicitCastInputTypes {

  // analysis-time contract: an INT key gets an implicit cast; an
  // incompatible column fails resolution, not execution
  override def inputTypes: Seq[DataType] = Seq(LongType)

  require(numBits >= 64 && numBits % 64 == 0 &&
    numBits <= 64L * Int.MaxValue,
    s"graft_bloom_build numBits must be a positive multiple of 64, got $numBits")
  require(numHashes >= 1 && numHashes <= 32,
    s"graft_bloom_build numHashes must be in [1,32], got $numHashes")

  private def numWords: Int = (numBits / 64L).toInt

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) BloomOps.setBits(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) |= b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    val bb = ByteBuffer.allocate(4 + buf.length * 8)
    bb.putInt(numHashes)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def prettyName: String = "graft_bloom_build"

  override def withNewMutableAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): BloomBuildAgg =
    copy(child = newChild)
}

/** `array<long>` → the subset that might be in a serialized Bloom filter
  * (no false negatives; order preserved). The filter arrives as a plain
  * binary COLUMN (attached by a single-row broadcast join), and the test
  * is direct bit arithmetic on the serialized bytes — no per-row
  * deserialization, no objects, safe inside whole-stage codegen.
  *
  * This is the doc-local shuffle killer for semi-joins on exploded keys:
  * filtering the key array BEFORE explode+exchange cuts the shuffled
  * volume to (true matches + FP·|keys|) while keeping downstream results
  * exact — false positives simply fail the real join. */
case class BloomRetain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bloom_retain"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (binary, array<bigint>), " +
          s"got ${left.dataType.sql} and ${right.dataType.sql}")
    }

  override def nullSafeEval(bloom: Any, grams: Any): Any =
    BloomOps.retain(bloom.asInstanceOf[Array[Byte]],
      grams.asInstanceOf[ArrayData])

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bloom, grams) =>
      s"${ev.value} = graft.functions.BloomOps.retain($bloom, $grams);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomRetain =
    copy(left = newLeft, right = newRight)
}

object BloomExprs {
  /** Column API for [[BloomBuildAgg]] (an aggregate function). */
  def bloomBuild(key: Column, numBits: Long, numHashes: Int): Column =
    GraftColumnBridge.column(BloomBuildAgg(
      GraftColumnBridge.expression(key), numBits, numHashes)
      .toAggregateExpression())

  /** Column API for [[BloomRetain]]. */
  def bloomRetain(bloom: Column, grams: Column): Column =
    GraftColumnBridge.column(BloomRetain(
      GraftColumnBridge.expression(bloom), GraftColumnBridge.expression(grams)))

  /** Probe-side membership for a single key (interpreted helper for
    * tests and driver-side checks; the hot path uses [[BloomRetain]]). */
  def mightContain(serialized: Array[Byte], key: Long): Boolean =
    BloomOps.mightContain(serialized, key)
}
