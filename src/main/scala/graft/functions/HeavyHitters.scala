package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequent-items summary as a mergeable custom aggregate.
  *
  * The exact formulation (`GROUP BY item` then rank) shuffles one row per
  * DISTINCT item; over a 100 TB token or URL column the distinct space
  * itself is the cost. [[MisraGriesAgg]] holds at most `capacity`
  * counters per group: map-side partials bound every partition's
  * contribution to `capacity` entries before the shuffle, and merge
  * (Agarwal et al., "Mergeable Summaries", PODS'12) combines summaries
  * without losing the deterministic error bound
  *
  *   true_count − N/(capacity+1)  ≤  est  ≤  true_count
  *
  * where N is the group's total item count — so any item with frequency
  * above N/(capacity+1) is GUARANTEED present in the summary (the
  * frequent-items contract; law-tested in HeavyHittersSpec under
  * arbitrary stream splits). When the column's distinct count is at most
  * `capacity`, no counter is ever decremented and the summary is EXACTLY
  * the group-by counts regardless of partitioning or merge order — the
  * regime `q_heavy_hitters`' DuckDB oracle pins; the approximation
  * regime is inherently merge-order-dependent, so it is verified by
  * bound laws, not value hashes (same gating discipline as the KMV
  * sketch estimator).
  *
  * Update is the textbook rule: present → increment; absent with spare
  * room → insert at 1; absent and full → decrement ALL counters, drop
  * zeros. A full decrement costs O(capacity) but can happen at most
  * N/(capacity+1) times per N updates (each removes capacity+1 total
  * count including the arriving item), so updates stay amortized O(1).
  *
  * Reference analog: the reference's value_counts()-style tabulations
  * (hummingbird990.py's per-state/per-NTEE rollups) — re-expressed as the
  * bounded-memory form that survives an unbounded key space.
  */
case class MisraGriesAgg(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with org.apache.spark.sql.graftshim.StringUnaryInputCast {

  require(capacity >= 1, "heavy_hitters: capacity must be >= 1")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.asInstanceOf[UTF8String].toString
      buf.get(item) match {
        case Some(c) => buf.update(item, c + 1L)
        case None if buf.size < capacity => buf.update(item, 1L)
        case None => // full: the arriving item and one unit of every
          // counter annihilate (capacity+1 total count retired)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.foreach { case (k, c) =>
            if (c == 1L) dead += k else buf.update(k, c - 1L)
          }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
  : mutable.HashMap[String, Long] = {
    other.foreach { case (k, c) =>
      buf.update(k, buf.getOrElse(k, 0L) + c)
    }
    if (buf.size > capacity) {
      // subtract the (capacity+1)-th largest counter from everything and
      // drop the non-positive: at most `capacity` survivors, error grows
      // by exactly that subtracted value (Mergeable Summaries, Thm. 1)
      val cut = buf.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (k, c) =>
        if (c - cut <= 0L) dead += k else buf.update(k, c - cut)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  /** Array of (item, count_est) structs, count desc then item asc. */
  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.toArray.sortBy { case (k, c) => (-c, k) }
        .map { case (k, c) =>
          InternalRow(UTF8String.fromString(k), c): Any
        })

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val items = buf.toArray
    val bytes = items.map { case (k, _) => k.getBytes(StandardCharsets.UTF_8) }
    val bb = ByteBuffer.allocate(
      4 + items.length * 12 + bytes.map(_.length).sum)
    bb.putInt(items.length)
    items.zip(bytes).foreach { case ((_, c), b) =>
      bb.putInt(b.length); bb.put(b); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    (0 until n).foreach { _ =>
      val len = bb.getInt
      val b = new Array[Byte](len)
      bb.get(b)
      buf.update(new String(b, StandardCharsets.UTF_8), bb.getLong)
    }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("count_est", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override def prettyName: String = "heavy_hitters"

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = newChildren(0))
}

object HeavyHitters {
  /** Column API: bounded-memory frequent items of a string column. */
  def heavyHitters(item: Column, capacity: Int): Column = {
    val shim = org.apache.spark.sql.graftshim.ColumnInterop
    shim.column(
      MisraGriesAgg(shim.expression(item), capacity).toAggregateExpression())
  }
}
