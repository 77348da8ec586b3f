package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Exact upper-triangle second-moment accumulator for fixed-dimension
  * integer vectors: per input row (an `array<long>` of d scaled
  * components), accumulates Σ xs(i)·xs(j) for every i ≤ j in SIGNED
  * 128-bit integer cells — the covariance-numerator Gram the embedding
  * family shares ([[graft.ops.Similarity.covarianceNumerators]]).
  *
  * Why a TypedImperativeAggregate: the declarative form explodes
  * d(d+1)/2 (i, j) rows PER VECTOR through a string of decimal
  * multiplies into a hash aggregation — at d = 64 that is 2080 shuffled
  * rows per embedding, millions of rows per million vectors. This
  * aggregate keeps one d(d+1)/2-cell buffer per partition (two longs per
  * cell: hi/lo limbs), so only |partitions| buffers cross the exchange —
  * the same map-side-combine shape as TopK/Misra–Gries — and the inner
  * loop is two Java long multiplies per cell, no per-row allocation.
  *
  * Exactness: products of 2^44-scaled components reach 2^88;
  * Math.multiplyHigh gives the signed high limb, the low-limb carry is
  * the standard unsigned carry-out, and 128-bit cells overflow only past
  * ~2^38 input rows (guarded impossible at any realistic corpus ×
  * d(d+1)/2 bound). eval emits `array<decimal(38,0)>` in (i-major,
  * j ≥ i) order — 2^127 < 10^39, and actual magnitudes (≤ 2^88·n) stay
  * inside 38 digits below ~10^11 rows. CovAccumSpec pins equality to
  * the exploded decimal aggregation on the real corpus and on
  * adversarial sign/magnitude fixtures. */
case class CovAccumAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = d * (d + 1) / 2

  override def prettyName: String = "cov_accum"
  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DecimalType(38, 0), containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](cells * 2)

  override def update(buf: Array[Long], input: org.apache.spark.sql.catalyst.InternalRow): Array[Long] = {
    val arr = child.eval(input)
    if (arr == null) return buf
    val xs = arr.asInstanceOf[ArrayData]
    require(xs.numElements() == d,
      s"cov_accum(d=$d) got a ${xs.numElements()}-element vector")
    val v = new Array[Long](d)
    var i = 0
    while (i < d) { v(i) = xs.getLong(i); i += 1 }
    var cell = 0
    i = 0
    while (i < d) {
      val a = v(i)
      var j = i
      while (j < d) {
        val b = v(j)
        val pHi = Math.multiplyHigh(a, b)
        val pLo = a * b
        val o = cell * 2
        val lo = buf(o + 1)
        val newLo = lo + pLo
        val carry = ((lo & pLo) | ((lo | pLo) & ~newLo)) >>> 63
        buf(o) += pHi + carry
        buf(o + 1) = newLo
        cell += 1
        j += 1
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var c = 0
    while (c < cells) {
      val o = c * 2
      val lo = buf(o + 1)
      val pLo = other(o + 1)
      val newLo = lo + pLo
      val carry = ((lo & pLo) | ((lo | pLo) & ~newLo)) >>> 63
      buf(o) += other(o) + carry
      buf(o + 1) = newLo
      c += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](cells)
    var c = 0
    while (c < cells) {
      val hi = buf(c * 2)
      val lo = buf(c * 2 + 1)
      val big = java.math.BigInteger.valueOf(hi).shiftLeft(64)
        .add(new java.math.BigInteger(java.lang.Long.toUnsignedString(lo)))
      out(c) = org.apache.spark.sql.types.Decimal(new java.math.BigDecimal(big), 38, 0)
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(cells * 2)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovAccumAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovAccumAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CovAccumAgg =
    copy(child = newChildren.head)
}

object CovAccum {
  /** Column API: Σ upper-triangle products of a d-element array<long>. */
  def covAccum(xs: Column, d: Int): Column =
    org.apache.spark.sql.graftshim.ColumnInterop.column(
      CovAccumAgg(org.apache.spark.sql.graftshim.ColumnInterop.expression(xs), d)
        .toAggregateExpression())
}
