package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}

/** Single-pass pipeline observability (`Dataset.observe`): named audit
  * metrics — row counts, null counts, value totals — are collected by the
  * SAME action that already materializes the pass (a parquet write, a
  * sink flush), never by a second scan. At 100 TB the difference between
  * "write + audit in one pass" and "write, then re-scan to count" is the
  * whole job doubled; observe rides the existing task metrics channel,
  * costs one aggregate buffer per task, and imposes no extra shuffle or
  * scan.
  *
  * Reference analog: the row-count / null-count prints sprinkled through
  * the reference pipeline's save paths (e.g.
  * `hv_master_data/Hummingbird_V5_ipeds_v5.py` logging frame sizes before
  * `to_csv`) — re-expressed as engine-level observed metrics instead of
  * driver-side len() calls on materialized frames.
  */
object Audit {

  /** Attach named metrics to the frame; they become available on the
    * returned [[Observation]] after the FIRST action over the returned
    * frame completes. Metrics must be aggregates over the observed plan
    * node (count/sum/min/max — no distinct aggregates). */
  def observed(df: DataFrame, name: String,
               first: Column, rest: Column*): (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs, first, rest: _*), obs)
  }
}
