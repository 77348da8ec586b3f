package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03):
  * Rabin-Karp rolling hashes over character k-grams, keeping the minimum
  * hash in each sliding window of `w` consecutive k-grams (rightmost on
  * ties). The selected set is a position-robust fingerprint: shared
  * substrings of length >= w+k-1 are guaranteed to share a fingerprint,
  * which makes overlap detection an equi-join on (fingerprint) — the
  * plagiarism/near-dup primitive the reference's rolling-hash
  * "document fingerprinting" capability calls for.
  *
  * Native Catalyst expression (generated code calls the static helper), no
  * UDF serialization; output is array<long> for `explode` + join.
  */
object Winnow {
  val K = 8   // k-gram length (chars)
  val W = 16  // winnow window (k-grams)
  private val B = 1000003L      // polynomial base
  private val M = (1L << 61) - 1 // Mersenne modulus

  def fingerprints(s: UTF8String): Array[Long] = fingerprintsString(s.toString)

  def fingerprintsString(str: String): Array[Long] = {
    // iterate by CODEPOINT, not UTF-16 code unit: SQL engines index
    // strings by codepoint (unicode()/len()), so a surrogate-pair char
    // (emoji, rare CJK) would otherwise shift every k-gram hash and
    // window count between engines. For BMP text the two are identical.
    val cps = str.codePoints().toArray
    val n = cps.length
    if (n < K) return Array.empty
    val nGrams = n - K + 1
    val hashes = new Array[Long](nGrams)
    // first k-gram hash + rolling updates (mod-mul via Math.multiplyHigh-free
    // path: values < 2^61, multiply in BigInt-free 128-bit via Math)
    def mulMod(a: Long, b: Long): Long = {
      // fold the 128-bit product mod 2^61-1: 2^64 = 8 (mod M), 2^61 = 1 (mod M)
      val hi = Math.multiplyHigh(a, b)
      val lo = a * b
      ((lo & M) + (lo >>> 61) + (hi << 3)) % M
    }
    var h = 0L
    var i = 0
    while (i < K) { h = (mulMod(h, B) + cps(i)) % M; i += 1 }
    hashes(0) = h
    // B^(K-1) mod M
    var bk = 1L
    i = 0
    while (i < K - 1) { bk = mulMod(bk, B); i += 1 }
    i = 1
    while (i < nGrams) {
      val out = cps(i - 1)
      h = (h - mulMod(out, bk)) % M
      if (h < 0) h += M
      h = (mulMod(h, B) + cps(i + K - 1)) % M
      hashes(i) = h
      i += 1
    }
    if (nGrams <= W) {
      var mn = hashes(0); var mi = 0; i = 1
      while (i < nGrams) { if (hashes(i) <= mn) { mn = hashes(i); mi = i }; i += 1 }
      return Array(hashes(mi))
    }
    // sliding-window minima via a monotonic deque: amortized O(1) per
    // position instead of rescanning the W-gram window (O(n) total, was
    // O(n*W) — this is the hot inner loop of the fingerprint build).
    // Popping `>=` from the back makes the newest of equal values survive,
    // which IS the rightmost-on-ties selection the windowed scan did.
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastIdx = -1
    val deque = new Array[Int](nGrams)
    var head = 0
    var tail = 0
    var j = 0
    while (j < W) { // prime the first window [0, W)
      while (tail > head && hashes(deque(tail - 1)) >= hashes(j)) tail -= 1
      deque(tail) = j; tail += 1
      j += 1
    }
    i = 0
    while (i + W <= nGrams) {
      while (deque(head) < i) head += 1 // evict out-of-window indices
      val mi = deque(head)
      if (mi != lastIdx) { out += hashes(mi); lastIdx = mi }
      val nj = i + W // admit the next window's new element
      if (nj < nGrams) {
        while (tail > head && hashes(deque(tail - 1)) >= hashes(nj)) tail -= 1
        deque(tail) = nj; tail += 1
      }
      i += 1
    }
    out.toArray
  }

  def winnow(c: Column): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      WinnowExpr(org.apache.spark.sql.graftshim.ColumnInterop.expression(c)))
}

case class WinnowExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
      Winnow.fingerprints(input.asInstanceOf[UTF8String]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(" +
        s"graft.functions.Winnow.fingerprints($c))")
  override protected def withNewChildInternal(newChild: Expression): WinnowExpr =
    copy(child = newChild)
}
