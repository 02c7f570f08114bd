package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

/** Document-local fingerprint/signature kernels.
  *
  * MinHash signatures, shingle sets, SimHash, and rolling fingerprints
  * are all per-document computations. Expressing them as explode →
  * shuffle → aggregate amplifies the data ~15× (one row per shingle)
  * through a shuffle — at corpus scale that is the difference between an
  * embarrassingly-parallel projection pass and shuffling multiples of
  * the corpus. These expressions do the whole computation in a tight
  * byte-level loop per row: zero shuffle, zero intermediate arrays
  * beyond the output.
  *
  * All kernels hash raw UTF-8 *bytes* (shingle windows are byte windows;
  * identical to character windows on ASCII text). Hash functions and
  * seeds match Spark's built-ins: murmur3/seed 42 (`hash()`),
  * xxhash64/seed 42 (`xxhash64()`).
  */
object ShingleOps {
  final val Seed = 42

  /** Minimum xxhash64 over k-byte windows (winnowing-style rolling
    * fingerprint). Caller guarantees numBytes >= k. */
  def rollingMin(s: UTF8String, k: Int): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    var min = java.lang.Long.MAX_VALUE
    var i = 0
    while (i <= n - k) {
      val h = XXH64.hashUnsafeBytes(base, off + i, k, Seed)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Unsigned-32-bit murmur3 hashes of every k-byte window (with
    * duplicates). Caller guarantees numBytes >= k. */
  private def windowHashes(s: UTF8String, k: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = Murmur3_x86_32.hashUnsafeBytes2(base, off + i, k, Seed) & 0xffffffffL
      i += 1
    }
    out
  }

  /** MinHash signature: the [[MinHashSig.NumPerms]] permutation minima
    * over the k-byte-window hashes. Caller guarantees numBytes >= k. */
  def minhashSig(s: UTF8String, k: Int): Array[Long] = {
    import MinHashSig.{A, B, NumPerms}
    val sig = Array.fill(NumPerms)(java.lang.Long.MAX_VALUE)
    val hs = windowHashes(s, k)
    var j = 0
    while (j < hs.length) {
      val h = hs(j)
      var i = 0
      while (i < NumPerms) {
        val x = (h * A(i) + B(i)) >>> 32
        if (x < sig(i)) sig(i) = x
        i += 1
      }
      j += 1
    }
    sig
  }

  /** Sorted distinct k-byte-window hashes (the shingle set, ready for
    * merge-intersection). xxhash64 — Jaccard over these equals true
    * shingle-set Jaccard up to ~|union|²/2⁶⁴ collision probability,
    * versus 2³² for the signature-path hashes (which must stay 32-bit
    * for the permutation arithmetic). Caller guarantees numBytes >= k. */
  def shingleSet(s: UTF8String, k: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val hs = new Array[Long](n - k + 1)
    var j = 0
    while (j <= n - k) {
      hs(j) = XXH64.hashUnsafeBytes(base, off + j, k, Seed)
      j += 1
    }
    sortedDistinct(hs)
  }

  /** Sort in place, drop adjacent duplicates, truncate. */
  private def sortedDistinct(hs: Array[Long]): Array[Long] = {
    java.util.Arrays.sort(hs)
    var w = 0
    var i = 0
    while (i < hs.length) {
      if (w == 0 || hs(i) != hs(w - 1)) { hs(w) = hs(i); w += 1 }
      i += 1
    }
    java.util.Arrays.copyOf(hs, w)
  }

  /** Sorted distinct k-CHAR-window hashes: gram boundaries follow UTF-8
    * code points (the `substr(text, i, k)` gram semantics), each gram
    * hashed over its underlying bytes. Identical to [[shingleSet]] on
    * single-byte text, and the boundary scan is a single pass either
    * way. Returns null for texts shorter than k chars. */
  def shingleSetChars(s: UTF8String, k: Int): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    // byte offset of each char start, plus the end sentinel
    val starts = new Array[Int](n + 1)
    var i = 0
    var c = 0
    while (i < n) {
      starts(c) = i
      c += 1
      i += UTF8String.numBytesForFirstByte(s.getByte(i))
    }
    starts(c) = n
    if (c < k) return null
    val hs = new Array[Long](c - k + 1)
    var j = 0
    while (j <= c - k) {
      hs(j) = XXH64.hashUnsafeBytes(
        base, off + starts(j), starts(j + k) - starts(j), Seed)
      j += 1
    }
    sortedDistinct(hs)
  }

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == 0x0b || b == '\f'

  /** 64-bit SimHash over whitespace-delimited byte tokens: per token one
    * xxhash64; bit b of the result is set when more tokens have bit b
    * set than clear. */
  def simhash(s: UTF8String, counts: Array[Int]): Long = {
    java.util.Arrays.fill(counts, 0)
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    var i = 0
    while (i < n) {
      while (i < n && isSpace(s.getByte(i))) i += 1
      val start = i
      while (i < n && !isSpace(s.getByte(i))) i += 1
      if (i > start) {
        val h = XXH64.hashUnsafeBytes(base, off + start, i - start, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }
}

private[functions] abstract class ShingleKernel extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")
  /** Static call target in [[ShingleOps]] (Scala object forwarder). */
  protected def opsCall(input: String): String
  protected def minBytes: Int

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => opsCall(c))
}

/** Winnowing-style rolling fingerprint column: min xxhash64 over k-byte
  * windows; null for texts shorter than k bytes. */
case class RollingMinHash(child: Expression, k: Int) extends ShingleKernel {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_minhash"
  override protected def minBytes: Int = k
  override protected def opsCall(input: String): String =
    s"graft.functions.ShingleOps.rollingMin($input, $k)"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (s.numBytes < k) null else ShingleOps.rollingMin(s, k)
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numBytes() < $k) { ${ev.isNull} = true; }
      |else { ${ev.value} = ${opsCall(c)}; }
    """.stripMargin)
  override protected def withNewChildInternal(c: Expression): RollingMinHash =
    copy(child = c)
}

/** MinHash signature column (array<long> of 64 permutation minima);
  * null for texts shorter than k bytes. */
case class MinHashSigExpr(child: Expression, k: Int) extends ShingleKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_sig_of"
  override protected def minBytes: Int = k
  override protected def opsCall(input: String): String =
    s"graft.functions.ShingleOps.minhashSig($input, $k)"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (s.numBytes < k) null
    else new GenericArrayData(ShingleOps.minhashSig(s, k))
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numBytes() < $k) { ${ev.isNull} = true; }
      |else { ${ev.value} =
      |  new org.apache.spark.sql.catalyst.util.GenericArrayData(${opsCall(c)}); }
    """.stripMargin)
  override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
    copy(child = c)
}

/** Sorted distinct shingle-hash set column (array<long>); null for texts
  * shorter than k bytes. Ready for [[SortedIntersectSize]]. */
case class ShingleSetExpr(child: Expression, k: Int) extends ShingleKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_set"
  override protected def minBytes: Int = k
  override protected def opsCall(input: String): String =
    s"graft.functions.ShingleOps.shingleSet($input, $k)"

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String]
    if (s.numBytes < k) null
    else new GenericArrayData(ShingleOps.shingleSet(s, k))
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      |if ($c.numBytes() < $k) { ${ev.isNull} = true; }
      |else { ${ev.value} =
      |  new org.apache.spark.sql.catalyst.util.GenericArrayData(${opsCall(c)}); }
    """.stripMargin)
  override protected def withNewChildInternal(c: Expression): ShingleSetExpr =
    copy(child = c)
}

/** Sorted distinct CHAR-shingle-hash set column (array<long>); null for
  * texts shorter than k chars. Gram boundaries follow code points, so
  * Jaccard over these matches `substr`-gram Jaccard on any text (up to
  * xxhash64 collisions), not just ASCII. */
case class ShingleSetCharsExpr(child: Expression, k: Int)
    extends ShingleKernel {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_shingle_set_chars"
  override protected def minBytes: Int = k
  override protected def opsCall(input: String): String =
    s"graft.functions.ShingleOps.shingleSetChars($input, $k)"

  override def nullSafeEval(v: Any): Any = {
    val a = ShingleOps.shingleSetChars(v.asInstanceOf[UTF8String], k)
    if (a == null) null else new GenericArrayData(a)
  }
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, { c =>
      val tmp = ctx.freshName("grams")
      s"""
      |long[] $tmp = ${opsCall(c)};
      |if ($tmp == null) { ${ev.isNull} = true; }
      |else { ${ev.value} =
      |  new org.apache.spark.sql.catalyst.util.GenericArrayData($tmp); }
      """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression): ShingleSetCharsExpr =
    copy(child = c)
}

/** 64-bit SimHash column over whitespace-delimited tokens. */
case class SimHash64(child: Expression) extends ShingleKernel {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"
  override protected def minBytes: Int = 0
  override protected def opsCall(input: String): String = "" // unused

  // scratch buffer is allocated per call: a bound expression instance can
  // be evaluated from multiple threads on the interpreted path, so a
  // shared per-instance array would race (codegen allocates per-plan
  // mutable state, which is single-threaded by construction)
  override def nullSafeEval(v: Any): Any =
    ShingleOps.simhash(v.asInstanceOf[UTF8String], new Array[Int](64))
  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val buf = ctx.addMutableState("int[]", "simhashCounts",
      n => s"$n = new int[64];")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleOps.simhash($c, $buf);")
  }
  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Column API for the document-local kernels. */
object ShingleExprs {
  private def expr(c: Column) = GraftColumnBridge.expression(c)
  private def col(e: Expression) = GraftColumnBridge.column(e)

  def rollingMinHash(text: Column, k: Int): Column =
    col(RollingMinHash(expr(text), k))
  def minhashSignature(text: Column, k: Int): Column =
    col(MinHashSigExpr(expr(text), k))
  def shingleSet(text: Column, k: Int): Column =
    col(ShingleSetExpr(expr(text), k))
  def shingleSetChars(text: Column, k: Int): Column =
    col(ShingleSetCharsExpr(expr(text), k))
  def simhash64(text: Column): Column = col(SimHash64(expr(text)))
}
