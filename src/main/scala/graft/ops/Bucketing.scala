package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: the shuffle-free co-located join.
  *
  * At 100 TB the dominant cost of a fact-to-fact equi-join is shuffling
  * both sides on the key. Writing each table ONCE bucketed by the join
  * key (hash-partitioned into a fixed bucket count, sorted within
  * buckets) moves that shuffle to write time and amortizes it over every
  * subsequent join/aggregation on the same key: Spark's scan reports the
  * bucketing as `HashPartitioning`, so the join planner needs NO
  * Exchange on either side — bucket i joins bucket i, executor-local.
  * An equality predicate on the bucket key additionally prunes to a
  * single bucket at scan time (`SelectedBucketsCount: 1 out of N`),
  * BucketingSpec asserts both properties from the plan text plus result
  * equality with the plain join.
  *
  * Sizing rule at scale: buckets ~ table_bytes / target_partition_bytes
  * (128-512 MB), and both join sides MUST use the same count — unequal
  * counts fall back to shuffling the smaller side (Spark can re-bucket
  * one side only when counts divide evenly).
  *
  * Reference analog: the reference re-reads and re-merges its master CSV
  * per script run (`master_acreage_merge.py`); a bucketed master table
  * makes every one of those merges shuffle-free on ein/name keys.
  */
object Bucketing {

  /** Write `df` as a catalog-managed parquet table bucketed AND sorted by
    * `keys` — the layout every later equi-join/group-by on `keys` reuses
    * without an exchange (and with sort-merge-ready bucket files). */
  def writeBucketed(df: DataFrame, table: String, buckets: Int,
                    keys: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)

  /** Equi-join two identically-bucketed tables on the bucket keys: plans
    * as a SortMergeJoin whose children are bare bucketed scans — zero
    * Exchange on either side at any data size. */
  def cojoin(spark: SparkSession, tableA: String, tableB: String,
             keys: Seq[String]): DataFrame =
    spark.table(tableA).join(spark.table(tableB), keys)
}
