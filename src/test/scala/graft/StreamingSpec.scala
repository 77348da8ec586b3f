package graft

import java.nio.file.Files

import graft.queries.EventsQueries
import graft.streaming.EventStream

/** The streaming slice must agree with its batch equivalent: a tumbling
  * windowed aggregation over the same events parquet, and an idempotent
  * foreachBatch upsert. */
class StreamingSpec extends SparkSuite {

  test("streaming tumbling counts equal the batch tumbling query") {
    val tmp = Files.createTempDirectory("graftstream").toFile.getAbsolutePath
    val agg = EventStream.tumblingCounts(EventStream.source(spark, sf))
    val got = EventStream.runToMemory(spark, agg, "tumbling_out", s"$tmp/ckpt")
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    val exp = EventsQueries.queries("q_events_tumbling")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == exp)
  }

  test("stateful sessionization matches the windowed batch sessionize query") {
    val typed = graft.streaming.Sessionize
      .sessionize(spark, graft.core.Tables.events(spark, sf), 1800L * 1000000L)
      .collect()
      .map(s => (s.user_id, s.start_us) -> (s.n_events, s.end_us)).toMap
    val batch = graft.queries.EventsQueries.queries("q_sessionize")(spark, sf)
      .collect()
      .map(r => (r.getLong(r.fieldIndex("user_id")), r.getLong(r.fieldIndex("start_us"))) ->
        (r.getLong(r.fieldIndex("n_events")), r.getLong(r.fieldIndex("end_us")))).toMap
    assert(typed.nonEmpty)
    assert(typed == batch)
  }

  test("foreachBatch upsert is idempotent and only updates if better") {
    val tmp = Files.createTempDirectory("graftupsert").toFile.getAbsolutePath
    val store = s"$tmp/store"
    EventStream.runUpsert(spark, EventStream.source(spark, sf), store, s"$tmp/c1")
    val first = spark.read.parquet(store).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // re-run with a fresh checkpoint (same data): only-update-if-better
    // must leave the store unchanged
    EventStream.runUpsert(spark, EventStream.source(spark, sf), store, s"$tmp/c2")
    val second = spark.read.parquet(store).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(first == second)
    assert(first.nonEmpty)
  }
}
