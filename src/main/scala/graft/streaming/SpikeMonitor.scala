package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming twin of the batch `q_rate_spikes` monitor on the modern
  * stateful API: per event type, hourly ingest counts are held in a
  * `ListState` (one (hour, n) entry per OBSERVED hour — the second
  * Spark-4 state-variable shape next to [[RunningTotals]]'s
  * `ValueState`), and every batch re-emits the spike decision for each
  * hour with >= 3 observed predecessors: spike when n·3 > trailing·2,
  * the same integer-domain rule as the batch query.
  *
  * Determinism: the state fold is a commutative per-hour counter merge,
  * so the final per-(type, hour) decision is independent of micro-batch
  * slicing and row order. Emitted rows carry `hours_seen` (state size at
  * emission) — rows with the per-key MAX `hours_seen` are the final,
  * complete snapshot (a key's last input batch sees all its data), which
  * is what StreamingSpec compares against the batch query.
  *
  * State hygiene at scale: one entry per (type, observed hour) — linear
  * in the monitoring horizon, not in events. A production deployment
  * bounds it with `TTLConfig` (per-variable TTL is the point of the new
  * API) or a retention cut inside `handleInputRows`; the test horizon
  * needs neither. */
object SpikeMonitor {

  case class HourEvent(event_type: String, hour_us: Long)
  case class SpikeRow(event_type: String, hour_us: Long, n: Long,
                      trailing_n: Long, spike: Boolean, hours_seen: Int)

  class Processor extends StatefulProcessor[String, HourEvent, SpikeRow] {
    @transient private var hours: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      hours = getHandle.getListState[(Long, Long)](
        "hours", Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[HourEvent],
                                 timerValues: TimerValues): Iterator[SpikeRow] = {
      val acc = scala.collection.mutable.HashMap.empty[Long, Long]
      hours.get().foreach { case (h, n) => acc(h) = acc.getOrElse(h, 0L) + n }
      rows.foreach { e => acc(e.hour_us) = acc.getOrElse(e.hour_us, 0L) + 1L }
      val sorted = acc.toArray.sortBy(_._1)
      hours.put(sorted)
      sorted.indices.iterator.filter(_ >= 3).map { i =>
        val (h, n) = sorted(i)
        val trailing = sorted(i - 3)._2 + sorted(i - 2)._2 + sorted(i - 1)._2
        SpikeRow(key, h, n, trailing, n * 3 > trailing * 2, sorted.length)
      }
    }
  }

  /** Per-type hourly spike decisions over an event stream. */
  def spikes(events: DataFrame): Dataset[SpikeRow] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .as[HourEvent]
      .groupByKey(_.event_type)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Update())
  }
}
