package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression, UnaryExpression}
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

  /** The REFERENCE encode: apply a whole merge table in rank order,
    * one greedy leftmost non-overlapping pass per rank — O(nMerges ·
    * len) per word. Kept as the semantic ground truth for the
    * heap≡greedy equivalence law (KernelFuzzSpec); the production
    * entry point [[encodeAll]] runs the rank-heap encoder below. */
  def encodeAllGreedy(arr: ArrayData, lefts: ArrayData,
      rights: ArrayData, sep: UTF8String): ArrayData = {
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

  /** A merge table compiled for the rank-heap encoder: rank-aligned
    * symbol/merged arrays (UTF8Strings CLONED out of the source
    * ArrayData so the compiled form never aliases a transient row
    * buffer) plus a pair → sorted-ranks index. Ranks whose left or
    * right symbol is null are inert (they can never match — the
    * greedy reference's `equals(null)` is false) and get no index
    * entry. */
  final class CompiledTable(leftsAD: ArrayData, rightsAD: ArrayData,
      sep: UTF8String) {
    val n: Int = leftsAD.numElements()
    val lefts = new Array[UTF8String](n)
    val rights = new Array[UTF8String](n)
    val merged = new Array[UTF8String](n)
    /** left → (right → sorted ranks); nested so a pair probe is two
      * hash lookups with ZERO key allocation on the encode hot path. */
    val ranks =
      new java.util.HashMap[UTF8String, java.util.HashMap[UTF8String, Array[Int]]]()
    locally {
      val tmp = new java.util.HashMap[UTF8String,
        java.util.HashMap[UTF8String, java.util.ArrayList[Integer]]]()
      var k = 0
      while (k < n) {
        val l = leftsAD.getUTF8String(k)
        val r = rightsAD.getUTF8String(k)
        if (l != null && r != null) {
          val lc = l.clone(); val rc = r.clone()
          lefts(k) = lc; rights(k) = rc
          merged(k) = UTF8String.concat(lc, sep, rc)
          var inner = tmp.get(lc)
          if (inner == null) {
            inner =
              new java.util.HashMap[UTF8String, java.util.ArrayList[Integer]]()
            tmp.put(lc, inner)
          }
          var lst = inner.get(rc)
          if (lst == null) {
            lst = new java.util.ArrayList[Integer](1); inner.put(rc, lst)
          }
          lst.add(k)
        }
        k += 1
      }
      val it = tmp.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val inner = new java.util.HashMap[UTF8String, Array[Int]]()
        val it2 = e.getValue.entrySet().iterator()
        while (it2.hasNext) {
          val e2 = it2.next()
          val a = new Array[Int](e2.getValue.size)
          var j = 0
          while (j < a.length) { a(j) = e2.getValue.get(j); j += 1 }
          inner.put(e2.getKey, a) // insertion order was rank order: sorted
        }
        ranks.put(e.getKey, inner)
      }
    }
    /** Element-k equality against a raw (lefts, rights) pair. */
    private def sameAt(ls: ArrayData, rs: ArrayData, k: Int): Boolean = {
      val l = ls.getUTF8String(k); val r = rs.getUTF8String(k)
      val le = lefts(k); val re = rights(k)
      if (le == null || re == null) {
        // inert rank: stored as (null, null) even if only one side was
        l == null || r == null
      } else
        l != null && r != null && l.equals(le) && r.equals(re)
    }
    /** Content equality against a raw (lefts, rights) pair — the cache
      * fallback when reference identity misses. */
    def sameTable(ls: ArrayData, rs: ArrayData): Boolean = {
      if (ls.numElements() != n || rs.numElements() != n) return false
      var k = 0
      while (k < n) {
        if (!sameAt(ls, rs, k)) return false
        k += 1
      }
      true
    }
    /** O(1) guard behind the identity fast path: length plus first/last
      * element equality. Reference identity alone is unsound if an
      * engine path ever REUSES an ArrayData object with different
      * contents (the public encode Column API accepts arbitrary
      * non-literal table expressions); this catches a mutated buffer
      * without paying the full sameTable walk. */
    def spotCheck(ls: ArrayData, rs: ArrayData): Boolean = {
      if (ls.numElements() != n || rs.numElements() != n) return false
      n == 0 || (sameAt(ls, rs, 0) && sameAt(ls, rs, n - 1))
    }
  }

  /** Per-thread 2-slot compiled-table cache. Keyed by reference
    * identity of the (lefts, rights) ArrayData first (literal tables —
    * `typedlit` — return the SAME GenericArrayData every eval, so the
    * common tokenize routes hit at O(1)), then by content equality
    * (one O(m) memcmp walk) before recompiling. Two slots so a plan
    * carrying two tables (e.g. char- and byte-level side by side)
    * doesn't thrash. */
  private final class CacheSlot {
    var leftsRef: AnyRef = null
    var rightsRef: AnyRef = null
    var sepRef: UTF8String = null
    var table: CompiledTable = null
  }
  private val cache = new ThreadLocal[Array[CacheSlot]] {
    override def initialValue(): Array[CacheSlot] =
      Array(new CacheSlot, new CacheSlot)
  }

  private def compiled(lefts: ArrayData, rights: ArrayData,
      sep: UTF8String): CompiledTable = {
    val slots = cache.get()
    var s = 0
    while (s < slots.length) {
      val c = slots(s)
      // identity is gated to GenericArrayData (the `typedlit` literal
      // shape the tokenize routes produce — allocated once, never
      // mutated) AND an O(1) content spot check, so a reused-buffer
      // ArrayData can never return a stale compiled table silently;
      // anything else falls through to the content-equality walk.
      if (c.table != null && c.sepRef.equals(sep) &&
          (c.leftsRef eq lefts) && (c.rightsRef eq rights) &&
          lefts.isInstanceOf[GenericArrayData] &&
          rights.isInstanceOf[GenericArrayData] &&
          c.table.spotCheck(lefts, rights))
        return c.table
      s += 1
    }
    s = 0
    while (s < slots.length) {
      val c = slots(s)
      if (c.table != null && c.sepRef.equals(sep) &&
          c.table.sameTable(lefts, rights)) {
        c.leftsRef = lefts; c.rightsRef = rights
        return c.table
      }
      s += 1
    }
    // miss: compile into slot 1 after promoting slot 1 -> 0? Keep it
    // simple: shift slot 0 to slot 1, compile into slot 0 (MRU first).
    // Construct BEFORE touching the slot: if the constructor throws
    // (corrupt table via the raw Column API), the evicted slot must
    // not be left holding its OLD compiled table paired with the NEW
    // array refs — that pairing could later satisfy the identity fast
    // path and silently encode with a stale table.
    val built = new CompiledTable(lefts, rights, sep)
    val evicted = slots(1)
    slots(1) = slots(0)
    val c = evicted
    c.leftsRef = lefts; c.rightsRef = rights; c.sepRef = sep
    c.table = built
    slots(0) = c
    built
  }

  /** Rank-heap BPE encode — output-identical to [[encodeAllGreedy]]
    * for ARBITRARY tables, O(len² + len·log len) per word and
    * independent of table size. The greedy fold's semantics are "for
    * each rank in order, one greedy pass IF the pair is present at
    * that point"; this simulates exactly that while skipping absent
    * ranks: a min-heap seeded with every rank of every pair adjacent
    * in the initial word, popped in (monotonically increasing) rank
    * order; each applied pass rescans adjacencies and pushes only
    * ranks GREATER than the applied rank — a pair created by merge k
    * must not fire a rank the sequential fold already passed. A popped
    * rank whose pair was destroyed earlier finds no occurrence and
    * no-ops, exactly as the fold would. */
  def encodeHeap(arr: ArrayData, t: CompiledTable): ArrayData = {
    var cur = new Array[UTF8String](arr.numElements())
    var i = 0
    while (i < cur.length) { cur(i) = arr.getUTF8String(i); i += 1 }
    if (cur.length < 2 || t.ranks.isEmpty) return new GenericArrayData(cur)
    val pushed = new java.util.HashSet[Integer]()
    val heap = new java.util.PriorityQueue[Integer]()
    def pushPresent(minExclusive: Int): Unit = {
      var j = 0
      while (j + 1 < cur.length) {
        val a = cur(j); val b = cur(j + 1)
        if (a != null && b != null) {
          val inner = t.ranks.get(a)
          val rks = if (inner == null) null else inner.get(b)
          if (rks != null) {
            var q = 0
            while (q < rks.length) {
              val rk = rks(q)
              if (rk > minExclusive && pushed.add(rk)) heap.add(rk)
              q += 1
            }
          }
        }
        j += 1
      }
    }
    pushPresent(-1)
    while (!heap.isEmpty && cur.length >= 2) {
      val k: Int = heap.poll()
      val l = t.lefts(k); val r = t.rights(k); val merged = t.merged(k)
      val out = new java.util.ArrayList[UTF8String](cur.length)
      var changed = false
      i = 0
      while (i < cur.length) {
        val isPair = i + 1 < cur.length && cur(i) != null &&
          cur(i).equals(l) && cur(i + 1) != null && cur(i + 1).equals(r)
        if (isPair) { out.add(merged); i += 2; changed = true }
        else { out.add(cur(i)); i += 1 }
      }
      if (changed) {
        cur = out.toArray(new Array[UTF8String](out.size))
        pushPresent(k)
      }
    }
    new GenericArrayData(cur)
  }

  /** Below this table size the plain greedy fold wins: m passes over
    * a short word cost less than the heap path's per-word heap/set
    * bookkeeping. Crossover measured on the bench corpus; both paths
    * are output-identical so the constant is purely a speed knob. */
  private final val HeapThreshold = 48

  /** Apply a whole merge table in rank order (see [[BpeEncodeExpr]]).
    * `lefts`/`rights` are rank-aligned arrays. Production path: greedy
    * fold for small tables, cached-compile rank-heap encoder past
    * [[HeapThreshold]] — O(len² + len·log len) per word, independent
    * of vocabulary size, which at real nMerges (1k–30k) is the
    * difference between the kernel constant scaling with the corpus
    * or with corpus × vocabulary (equivalence with the greedy fold is
    * a KernelFuzzSpec law). */
  def encodeAll(arr: ArrayData, lefts: ArrayData, rights: ArrayData,
      sep: UTF8String): ArrayData =
    if (lefts.numElements() < HeapThreshold)
      encodeAllGreedy(arr, lefts, rights, sep)
    else encodeHeap(arr, compiled(lefts, rights, sep))

  private final val HexDigits = "0123456789ABCDEF".getBytes(
    java.nio.charset.StandardCharsets.US_ASCII)

  /** BPE symbol initialization of one whitespace word, both alphabet
    * levels: CHAR level = the word's code-point characters; BYTE level
    * = its UTF-8 bytes as uppercase two-hex-digit symbols; either way
    * `eow` is concatenated onto the FINAL symbol (the Sennrich
    * end-of-word convention). Empty word → empty array.
    *
    * Output-identical (on valid UTF-8 — all symbols the split-based
    * routes can ever see) to the declarative columns it replaces
    * (`array_remove(split(w, ""), "")` / `regexp_extract_all(hex(
    * encode(w, "UTF-8")), "(..)", 1)` + slice/concat), proven as a
    * KernelFuzzSpec law. The point is the per-OCCURRENCE constant: the
    * encode routes run init once per word occurrence of the corpus,
    * and the regex engine + intermediate hex string dominated the
    * byte-level encode's wall time; this is one bounded byte walk. */
  def initSymbols(word: UTF8String, eow: UTF8String,
      byteLevel: Boolean): ArrayData = {
    val n = word.numBytes
    if (n == 0) return new GenericArrayData(new Array[UTF8String](0))
    val bytes = word.getBytes
    if (byteLevel) {
      val out = new Array[UTF8String](n)
      var i = 0
      while (i < n) {
        val b = bytes(i) & 0xff
        val sb = new Array[Byte](2)
        sb(0) = HexDigits(b >>> 4)
        sb(1) = HexDigits(b & 0xf)
        out(i) = UTF8String.fromBytes(sb)
        i += 1
      }
      out(n - 1) = UTF8String.concat(out(n - 1), eow)
      new GenericArrayData(out)
    } else {
      val out = new java.util.ArrayList[UTF8String](n)
      var i = 0
      while (i < n) {
        val w = UTF8String.numBytesForFirstByte(bytes(i))
        val end = if (i + w > n) n else i + w
        out.add(UTF8String.fromBytes(bytes, i, end - i))
        i = end
      }
      val last = out.size - 1
      out.set(last, UTF8String.concat(out.get(last), eow))
      new GenericArrayData(out.toArray(new Array[UTF8String](out.size)))
    }
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
  * state. Executes as the rank-heap encoder ([[BpeOps.encodeHeap]]):
  * O(len² + len·log len) per word, INDEPENDENT of table size, with the
  * table compiled once per task via the thread-local cache — but
  * output-identical to the sequential greedy fold
  * ([[BpeOps.encodeAllGreedy]], the KernelFuzzSpec equivalence law). */
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

/** Codegen column: BPE symbol initialization of one word — char- or
  * byte-level alphabet, `eow` suffixed on the final symbol (see
  * [[BpeOps.initSymbols]]). Null word → null (unreachable from the
  * Vocab routes: init is applied to whitespace-split products, which
  * are never null). */
case class BpeInitExpr(child: Expression, eow: String,
    byteLevel: Boolean) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_init"

  private val eowU = UTF8String.fromString(eow)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    BpeOps.initSymbols(v.asInstanceOf[UTF8String], eowU, byteLevel)

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val eowRef = ctx.addReferenceObj("eow", eowU,
      classOf[UTF8String].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.BpeOps.initSymbols($c, $eowRef, $byteLevel)")
  }

  override protected def withNewChildInternal(c: Expression): BpeInitExpr =
    copy(child = c)
}

object BpeExprs {
  def initSymbols(word: Column, eow: String, byteLevel: Boolean): Column =
    GraftColumnBridge.column(BpeInitExpr(
      GraftColumnBridge.expression(word), eow, byteLevel))

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
