package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash signature as a single typed imperative aggregate.
  *
  * Input: one hashed shingle (long) per row. Buffer: the 64 running
  * permutation minima as a primitive `long[]` — updated in place with a
  * tight multiply-add-mod loop, merged element-wise, serialized flat for
  * shuffle. Output: `array<long>` of length [[MinHashSig.NumPerms]].
  *
  * Versus 64 separate `min(pmod(...))` aggregate columns this has a tiny
  * codegen footprint (the 64-column formulation generates a huge
  * once-per-plan Janino compile, ~3s before the first row flows) and one
  * buffer slot instead of 64 — the partial-aggregate shuffle row is the
  * same 512 bytes, but the update path is a JVM loop the JIT vectorizes.
  *
  * Permutation parameters are deterministic engine constants (seeded),
  * so signatures are reproducible across runs and sessions.
  */
case class MinHashSig(child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import MinHashSig._

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(NumPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      // mask to unsigned 32 bits: multiply-shift is universal over
      // 32-bit inputs — masking makes any long input well-defined and
      // keeps 32-bit inputs (the documented contract) unchanged
      val h = v.asInstanceOf[Long] & 0xffffffffL
      var i = 0
      while (i < NumPerms) {
        val x = (h * A(i) + B(i)) >>> 32
        if (x < buf(i)) buf(i) = x
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < NumPerms) {
      if (b2(i) < b1(i)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(NumPerms * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](NumPerms)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_minhash_sig"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSig =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSig =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  val NumPerms = 64

  // deterministic multiply-shift permutation parameters (seeded engine
  // constants): odd 64-bit multiplier, 64-bit offset. The permutation
  // (a·h + b) >>> 32 (Dietzfelbinger universal hashing over 32-bit
  // inputs) replaces the classic (a·h + b) mod p — no 64-bit modulo in
  // the 64-perms-per-shingle inner loop
  private val params: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumPerms)((rnd.nextLong() | 1L, rnd.nextLong()))
  }
  val A: Array[Long] = params.map(_._1)
  val B: Array[Long] = params.map(_._2)

  /** Column API: aggregate a hashed-shingle column into a signature. */
  def signature(hashedShingle: Column): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(hashedShingle))
        .toAggregateExpression())
}
