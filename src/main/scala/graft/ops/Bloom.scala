package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Bloom-pruned membership against a persisted dedup index — the runtime
  * structure that makes exact incremental dedup affordable when the
  * resident corpus is 1000x the arriving batch.
  *
  * The plain incremental form ([[Dedup.incrementalFirstOccurrence]],
  * `q_line_dedup_incr`) anti-probes the index with an equi-join: correct,
  * but EVERY batch row shuffles to its key's reducer and meets the full
  * index partition there. In a real training-data pipeline almost every
  * arriving record is NEW — the join does a corpus-sized shuffle to
  * discover that nothing matched. A Bloom filter built over the index
  * keys inverts that cost: a bloom-NEGATIVE row is definitely absent
  * (Bloom filters have no false negatives), so it can be emitted as new
  * without ever entering the join; only bloom-POSITIVE rows — true
  * duplicates plus an `fpp` sliver of false positives — reach the exact
  * verify join. The result is bit-identical to the unpruned anti-join
  * (law-tested in BloomSpec, oracle-gated via `q_dedup_bloom` whose
  * DuckDB oracle knows nothing about blooms).
  *
  * The same trick prunes the OTHER side too: a second bloom over the
  * (small) batch keys filters the index scan before the verify join, so
  * index rows that cannot possibly match never shuffle — this is the
  * direction Spark's own `InjectRuntimeFilter` automates for joins it
  * can see through, re-expressed here explicitly because the definite-new
  * fast path (a union branch, not a join) is outside what that rule can
  * derive.
  *
  * Machinery: Spark's native `BloomFilterAggregate` /
  * `BloomFilterMightContain` expressions (the runtime-filter kernels —
  * codegen'd, operating on `xxhash64` of the key, serialized as the
  * `spark.util.sketch.BloomFilter` byte format). The built bloom is
  * collected to the driver as ONE bounded row (`numBits/8` bytes,
  * default 1 MiB) and re-enters the plan as a literal — exactly how
  * Spark's injected runtime filters execute (subquery -> literal), and
  * one of the repo's audited bounded collects. At 100 TB the index bloom
  * is NOT rebuilt per batch: `BloomFilter.mergeInPlace` is associative,
  * so the production pipeline persists the bloom next to the index and
  * folds each appended batch in; `numBits` stays capped and only `fpp`
  * degrades as the index grows — correctness never depends on it.
  *
  * Reference analog: the reference dedups resume state by re-reading its
  * full output CSV into a pandas index each run (hummingbird990.py's
  * seen-EIN scan); this is that membership test made incremental and
  * shuffle-avoiding.
  */
object Bloom {

  private val shim = org.apache.spark.sql.graftshim.ColumnInterop

  /** Default bloom sizing: 2^23 bits = 1 MiB; at the default build the
    * driver holds one such array per build — never row-proportional. */
  val DefaultNumBits: Long = 1L << 23

  /** Aggregate column producing one serialized bloom over xxhash64(key). */
  def bloomAgg(key: Column, expectedItems: Long,
               numBits: Long = DefaultNumBits): Column =
    shim.column(new BloomFilterAggregate(
      new XxHash64(Seq(shim.expression(key))),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Build and materialize the bloom (one 1-row job; bytes bounded by
    * `numBits/8`). Returns None on an empty frame. */
  def build(df: DataFrame, key: Column, expectedItems: Long,
            numBits: Long = DefaultNumBits): Option[Array[Byte]] = {
    val row = df.agg(bloomAgg(key, expectedItems, numBits).as("bf")).head()
    if (row.isNullAt(0)) None else Some(row.getAs[Array[Byte]](0))
  }

  /** Codegen'd probe: true when `key` MIGHT be in the bloom; false only
    * when it is DEFINITELY absent. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    shim.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(shim.expression(key)))))

  /** Exact index-membership check of `batch` against `index`, bloom-pruned
    * on both join inputs. Emits every batch row plus `is_new` — true iff
    * the row's `key` does not occur in `index`. Both frames must expose a
    * non-null `key` column; `index` may contain duplicates.
    *
    * Plan shape (PlanSpec-guarded): the definite-new branch is a
    * join-free filter; only bloom-positive batch rows and bloom-positive
    * index rows enter the single left join.
    */
  def newRows(index: DataFrame, batch: DataFrame, key: String,
              expectedItems: Long = 1L << 20,
              numBits: Long = DefaultNumBits): DataFrame = {
    val k = col(key)
    build(index.select(k), k, expectedItems, numBits) match {
      case None => // empty index: everything is new, no join at all
        batch.withColumn("is_new", lit(true))
      case Some(indexBloom) =>
        val probed = batch.withColumn("__hit", mightContain(indexBloom, k))
        val definiteNew = probed.filter(!col("__hit"))
          .withColumn("is_new", lit(true))
        // reverse prune: only index keys that might match a batch key
        // shuffle into the verify join (batch is the small side, so this
        // bloom is tight even at a capped size)
        val batchBloom = build(batch.select(k), k, expectedItems, numBits)
        val prunedIndex = batchBloom match {
          case Some(bb) => index.filter(mightContain(bb, k))
          case None     => index // empty batch: join input is empty anyway
        }
        val verified = probed.filter(col("__hit"))
          .join(prunedIndex.select(k).distinct()
              .withColumn("__in_index", lit(true)),
            Seq(key), "left")
          .withColumn("is_new", col("__in_index").isNull)
          .drop("__in_index")
        definiteNew.unionByName(verified).drop("__hit")
    }
  }
}
