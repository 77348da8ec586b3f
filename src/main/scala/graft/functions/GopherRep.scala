package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The Gopher Table-A1 repetition statistics (Rae et al. 2021, cf. the
  * reference's quality-screen family) for n-gram lengths 2..6 as ONE
  * native pass over the word array.
  *
  * Per n the declarative form ([[graft.queries.TextQueries]]'
  * `repRunStats`) materializes every n-gram string (`transform` +
  * `concat_ws(' ', slice(words, i, n))`), `array_sort`s them, and folds
  * the sorted array — five interpreted higher-order pipelines per row,
  * each allocating its own gram copies. This expression joins the words
  * ONCE into a shared byte buffer (single 0x20 separators — exactly the
  * `concat_ws` rendering, so every n-gram is a contiguous slice of the
  * buffer) and, per n, counts gram occurrences in an open-addressed map
  * keyed by (offset, length) into that buffer. No per-gram string is
  * ever allocated; the map stores three ints per distinct gram.
  *
  * Semantics are pinned to the fold bit-for-bit (GopherRepSpec laws:
  * full-corpus xxhash equality, adversarial fixtures, a scalacheck
  * property):
  *  - top{n} = cnt·numChars(gram) of the best run, best = highest count,
  *    ties to the UTF8-binary-smallest gram — the "first strict max over
  *    the sorted array" the fold computes, and the `min(struct(-cnt,
  *    gram))` argmax the original grouped form computed;
  *  - dup{n} = Σ cnt·numChars(gram) over grams with cnt > 1
  *    (order-independent);
  *  - numChars counts code points (Spark `length`), NOT UTF-16 units —
  *    on the byte slice this is the count of non-continuation bytes;
  *  - words shorter than n → (0, 0), matching the empty-array fold;
  *  - a NULL word element routes to a slow path that replays
  *    `concat_ws`'s skip-null semantics via [[UTF8String.concatWs]]
  *    (split() never produces nulls, but the equality law is universal).
  *
  * 100 TB shape: unchanged — pure projection riding the scan, zero
  * exchange; this is a constant-factor cut of the most expensive
  * shared-frame build in the bench (the gopher repetition bundle), not
  * a plan change.
  */
object GopherRep {

  val Ns: Range = 2 to 6

  val schema: StructType = StructType(Ns.flatMap(n => Seq(
    StructField(s"top$n", LongType, nullable = false),
    StructField(s"dup$n", LongType, nullable = false))).toArray)

  /** Column-level API. */
  def gopherRep(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      GopherRepExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))

  /** Static entry point referenced from generated code. */
  def stats(words: ArrayData): InternalRow = {
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (words.isNullAt(i)) return slowStats(words)
      i += 1
    }
    // Join once: words separated by single 0x20 — concat_ws's rendering
    // for null-free input (empty words contribute zero bytes but still
    // get separators on both sides, exactly like concat_ws).
    val ws = new Array[UTF8String](n)
    var total = 0
    i = 0
    while (i < n) {
      ws(i) = words.getUTF8String(i)
      total += ws(i).numBytes
      i += 1
    }
    if (n > 1) total += n - 1
    val buf = new Array[Byte](total)
    val starts = new Array[Int](n + 1) // starts(i) = offset of word i
    var o = 0
    i = 0
    while (i < n) {
      if (i > 0) { buf(o) = 0x20; o += 1 }
      starts(i) = o
      ws(i).writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + o)
      o += ws(i).numBytes
      i += 1
    }
    starts(n) = total + 1 // virtual next-word start (for slice-length math)

    val out = new Array[Any](Ns.length * 2)
    var oi = 0
    var g = Ns.head
    while (g <= Ns.last) {
      if (n < g) { out(oi) = 0L; out(oi + 1) = 0L }
      else {
        val grams = n - g + 1
        // open-addressed map over (offset, length) slices of buf
        var cap = 4
        while (cap < grams * 2) cap <<= 1
        val mask = cap - 1
        val off = new Array[Int](cap)
        val len = new Array[Int](cap)
        val cnt = new Array[Int](cap)
        java.util.Arrays.fill(off, -1)
        var gi = 0
        while (gi < grams) {
          val go = starts(gi)
          val gl = starts(gi + g) - 1 - go // drop trailing separator
          var slot = hashBytes(buf, go, gl) & mask
          var done = false
          while (!done) {
            if (off(slot) < 0) {
              off(slot) = go; len(slot) = gl; cnt(slot) = 1; done = true
            } else if (len(slot) == gl && regionsEqual(buf, off(slot), go, gl)) {
              cnt(slot) += 1; done = true
            } else slot = (slot + 1) & mask
          }
          gi += 1
        }
        var bestCnt = 0
        var bestOff = -1
        var bestLen = 0
        var dup = 0L
        var s = 0
        while (s < cap) {
          if (off(s) >= 0) {
            val c = cnt(s)
            if (c > bestCnt ||
                (c == bestCnt && bytesLess(buf, off(s), len(s), bestOff, bestLen))) {
              bestCnt = c; bestOff = off(s); bestLen = len(s)
            }
            if (c > 1) dup += c.toLong * numCharsOf(buf, off(s), len(s))
          }
          s += 1
        }
        out(oi) = bestCnt.toLong * numCharsOf(buf, bestOff, bestLen)
        out(oi + 1) = dup
      }
      oi += 2
      g += 1
    }
    new GenericInternalRow(out)
  }

  private def hashBytes(buf: Array[Byte], off: Int, len: Int): Int = {
    var h = -2128831035 // FNV-1a
    var i = off
    val end = off + len
    while (i < end) { h = (h ^ buf(i)) * 16777619; i += 1 }
    // spread the low bits (open addressing masks with cap-1)
    h ^ (h >>> 16)
  }

  private def regionsEqual(buf: Array[Byte], a: Int, b: Int, len: Int): Boolean = {
    if (a == b) return true
    var i = 0
    while (i < len) {
      if (buf(a + i) != buf(b + i)) return false
      i += 1
    }
    true
  }

  /** Unsigned-byte lexicographic less-than — UTF8String binary order. */
  private def bytesLess(buf: Array[Byte], ao: Int, al: Int, bo: Int, bl: Int): Boolean = {
    val m = math.min(al, bl)
    var i = 0
    while (i < m) {
      val d = (buf(ao + i) & 0xff) - (buf(bo + i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    al < bl
  }

  /** Code-point count of a UTF-8 slice = non-continuation bytes. */
  private def numCharsOf(buf: Array[Byte], off: Int, len: Int): Long = {
    var c = 0L
    var i = off
    val end = off + len
    while (i < end) {
      if ((buf(i) & 0xc0) != 0x80) c += 1
      i += 1
    }
    c
  }

  /** Null-element path: replay concat_ws's skip-null join per gram, count
    * in a heap map keyed by UTF8String (binary equals/ordering). */
  private def slowStats(words: ArrayData): InternalRow = {
    val n = words.numElements()
    val ws = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      ws(i) = if (words.isNullAt(i)) null else words.getUTF8String(i)
      i += 1
    }
    val sep = UTF8String.fromString(" ")
    val out = new Array[Any](Ns.length * 2)
    var oi = 0
    var g = Ns.head
    while (g <= Ns.last) {
      if (n < g) { out(oi) = 0L; out(oi + 1) = 0L }
      else {
        val counts = new java.util.HashMap[UTF8String, Array[Int]]()
        var gi = 0
        while (gi + g <= n) {
          val gram = UTF8String.concatWs(sep, java.util.Arrays.copyOfRange(ws, gi, gi + g): _*)
          val c = counts.get(gram)
          if (c == null) counts.put(gram, Array(1)) else c(0) += 1
          gi += 1
        }
        var bestCnt = 0
        var bestGram: UTF8String = null
        var dup = 0L
        val it = counts.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          val c = e.getValue()(0)
          if (c > bestCnt || (c == bestCnt && e.getKey.compareTo(bestGram) < 0)) {
            bestCnt = c; bestGram = e.getKey
          }
          if (c > 1) dup += c.toLong * e.getKey.numChars()
        }
        out(oi) = if (bestGram == null) 0L else bestCnt.toLong * bestGram.numChars()
        out(oi + 1) = dup
      }
      oi += 2
      g += 1
    }
    new GenericInternalRow(out)
  }
}

case class GopherRepExpr(child: Expression) extends UnaryExpression {
  override def prettyName: String = "gopher_rep"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gopher_rep needs array<string>, got $other")
    }
  override def dataType: DataType = GopherRep.schema
  override def nullSafeEval(input: Any): Any =
    GopherRep.stats(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GopherRep.stats($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherRepExpr =
    copy(child = newChild)
}
