package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Arbitrary per-key streaming state on the MODERN API
  * (`transformWithState`, Spark 4): a per-user running event counter and
  * value total maintained in a typed `ValueState`, emitting the updated
  * snapshot once per (micro-batch, user). The old API
  * (`flatMapGroupsWithState`) backs [[Sessionize]]; this is its Spark-4
  * replacement surface — explicit state variables with per-variable TTL,
  * RocksDB-backed (the provider the API requires), timer support.
  *
  * Determinism: the fold is COMMUTATIVE (count + integer-cents sum), so
  * the final per-user snapshot is independent of micro-batch slicing and
  * within-batch row order — StreamingSpec compares exactly that final
  * snapshot against the batch aggregation. */
object RunningTotals {

  case class UserEvent(user_id: Long, cents: Long)
  case class UserTotals(user_id: Long, n_events: Long, total_cents: Long)

  class Processor extends StatefulProcessor[Long, UserEvent, UserTotals] {
    @transient private var state: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[(Long, Long)](
        "totals", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
                                 timerValues: TimerValues): Iterator[UserTotals] = {
      var (n, cents) = if (state.exists()) state.get() else (0L, 0L)
      rows.foreach { e => n += 1; cents += e.cents }
      state.update((n, cents))
      Iterator.single(UserTotals(key, n, cents))
    }
  }

  /** Per-user running totals over an event stream; `value` is folded as
    * exact integer cents (`round(value*100)` per row, the same per-row
    * rule the batch twin applies). */
  def totals(events: DataFrame): Dataset[UserTotals] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .as[UserEvent]
      .groupByKey(_.user_id)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
