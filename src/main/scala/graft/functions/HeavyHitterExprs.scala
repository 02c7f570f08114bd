package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries heavy-hitter summary over the whitespace tokens of a
  * text column [Misra & Gries, "Finding repeated elements", 1982].
  *
  * One aggregation buffer of at most `capacity` (token, count)
  * counters, updated document-locally (the tokenizer runs inside the
  * aggregate — the corpus is never exploded into a token-per-row
  * relation for candidate generation) and merged with the
  * error-preserving summary merge of Agarwal et al., "Mergeable
  * Summaries", 2012: add matching counters, then subtract the
  * (capacity+1)-th largest count and drop the non-positive.
  *
  * Guarantee: every token whose true corpus frequency exceeds
  * N/(capacity+1) survives in the output, and each surviving estimate
  * undercounts by at most N/(capacity+1) — independent of how Spark
  * splits and merges partial aggregates, which is what makes the
  * downstream exact-threshold filter deterministic.
  *
  * Output: `array<struct<token string, est long>>`, capacity-bounded —
  * a single row regardless of corpus size (the whole point: candidate
  * generation without shuffling the distinct-token universe).
  */
case class MisraGriesTokens(child: Expression, capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
    with UnaryLike[Expression] {

  require(capacity > 0, s"MisraGriesTokens: capacity must be > 0, got $capacity")

  private type Buf = java.util.HashMap[String, Long]

  override def createAggregationBuffer(): Buf = new Buf(capacity * 2)

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) {
      val m = MisraGriesTokens.TokenPattern.matcher(v.toString)
      while (m.find()) {
        val tok = m.group()
        val cur = buf.get(tok)
        if (cur != null) buf.put(tok, cur + 1L)
        else if (buf.size < capacity) buf.put(tok, 1L)
        else decrementAll(buf, 1L) // classic MG: new key evicts 1 from all
      }
    }
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    val it = b2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = b1.get(e.getKey)
      b1.put(e.getKey, if (cur == null) e.getValue else cur + e.getValue)
    }
    if (b1.size > capacity) {
      // subtract the (capacity+1)-th largest count, drop non-positive —
      // restores the size bound while preserving the MG error bound
      val counts = new Array[Long](b1.size)
      var i = 0
      val vs = b1.values().iterator()
      while (vs.hasNext) { counts(i) = vs.next(); i += 1 }
      java.util.Arrays.sort(counts)
      decrementAll(b1, counts(b1.size - capacity - 1))
    }
    b1
  }

  private def decrementAll(buf: Buf, by: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= by) it.remove() else e.setValue(e.getValue - by)
    }
  }

  override def eval(buf: Buf): Any = {
    // deterministic order for a stable column value (the SET is merge-
    // order-independent; estimates are not, so sort by token alone)
    val keys = buf.keySet().toArray(new Array[String](buf.size))
    java.util.Arrays.sort(keys.asInstanceOf[Array[AnyRef]])
    new GenericArrayData(keys.map { k =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(k), buf.get(k)))
    })
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeUTF(e.getKey)
      out.writeLong(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new Buf(capacity * 2)
    var i = 0
    while (i < n) { buf.put(in.readUTF(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("est", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_misra_gries_tokens"

  override def withNewMutableAggBufferOffset(offset: Int): MisraGriesTokens =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MisraGriesTokens =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MisraGriesTokens =
    copy(child = newChild)
}

object MisraGriesTokens {
  /** Same token definition as [[TextAnalysis.tokenCount]] (`\S+`). */
  private[functions] val TokenPattern = java.util.regex.Pattern.compile("\\S+")

  /** Column API: MG summary of a text column's whitespace tokens. */
  def summary(text: Column, capacity: Int): Column =
    GraftColumnBridge.column(
      MisraGriesTokens(GraftColumnBridge.expression(text), capacity)
        .toAggregateExpression())
}
