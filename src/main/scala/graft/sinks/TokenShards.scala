package graft.sinks

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Megatron-style tokenized training shards — the LAST step of a
  * training-data pipeline: token-id sequences materialized as flat
  * little-endian int32 binary shards plus a queryable parquet index
  * (what a data loader memory-maps and random-accesses at train time).
  *
  * Layout under `path`:
  *  - `shard-<k>.bin` — back-to-back int32 ids of every doc on shard k,
  *    docs concatenated in ascending doc_id order;
  *  - `index/` — parquet `(doc_id, shard, offset_ids, n_ids)`; byte
  *    offset into the shard is `offset_ids * 4`.
  *
  * Scale shape: docs land on shards by `pmod(doc_id, nShards)` (uniform,
  * deterministic — shard count is the parallelism knob, sized so a shard
  * fits a loader's mmap); per-shard offsets are a window cumsum
  * PARTITIONED BY shard (bounded by one shard's row count, never a
  * global window); the binary encode runs per partition after ONE
  * repartition on the shard key — ids cross the shuffle once as arrays
  * and the byte stream is a partition-local fold (the multimodal
  * discipline: payload bytes never shuffle). Writes go through the
  * Hadoop FileSystem of `path`, so local paths and default-configured
  * DFS paths both work; a cluster needing non-default FS conf should
  * pass a fully-qualified URI resolvable from executors.
  *
  * Reference analog: the reference pipeline's terminal step is a master
  * CSV handed to a dashboard (`Hummingbird_Master_engine_990.py` write
  * step); for an LLM-corpus engine the terminal artifact is the token
  * shard, hence this sink next to the CSV/parquet/ORC/JSONL family. */
object TokenShards {

  /** Write `(doc_id: long, ids: array<int>)` as `nShards` binary shards
    * + index. Returns the number of docs written.
    *
    * Size `nShards` so each shard stays under 2 GiB (< 2^29 ids): the
    * shard is the loader's mmap/ByteBuffer unit and byte buffers are
    * int-addressed — the same bound every mmap-based loader imposes.
    * Hash partitioning may co-locate a few shard values in one task
    * (handled by the contiguous-run file roll below); with production
    * shard counts in the thousands that is a minor parallelism ripple,
    * never a correctness issue. */
  def write(docs: DataFrame, nShards: Int, path: String): Long = {
    require(nShards >= 1, "nShards must be >= 1")
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val sharded = graft.core.SharedFrames.register(docs
      .select(col("doc_id"), col("ids"))
      .withColumn("n_ids", size(col("ids")).cast("long"))
      .withColumn("shard", pmod(col("doc_id"), lit(nShards)).cast("int"))
      .withColumn("offset_ids", coalesce(sum(col("n_ids")).over(w), lit(0L))))
    sharded.select("doc_id", "shard", "offset_ids", "n_ids")
      .write.mode("overwrite").parquet(s"$path/index")
    sharded.select("shard", "doc_id", "ids")
      .repartition(nShards, col("shard"))
      .sortWithinPartitions("shard", "doc_id")
      .foreachPartition { (it: Iterator[Row]) =>
        // hash partitioning can co-locate several shard values in one
        // task; rows arrive sorted by (shard, doc_id), so shard runs are
        // contiguous — switch output files at run boundaries
        val conf = new org.apache.hadoop.conf.Configuration()
        var cur: Int = -1
        var out: java.io.OutputStream = null
        def roll(shard: Int): Unit = {
          if (out != null) out.close()
          val p = new org.apache.hadoop.fs.Path(s"$path/shard-$shard.bin")
          out = p.getFileSystem(conf).create(p, true)
          cur = shard
        }
        try {
          it.foreach { r =>
            val shard = r.getInt(0)
            if (shard != cur) roll(shard)
            val ids = r.getSeq[Int](2)
            val buf = ByteBuffer.allocate(ids.length * 4)
              .order(ByteOrder.LITTLE_ENDIAN)
            ids.foreach(buf.putInt)
            out.write(buf.array())
          }
        } finally if (out != null) out.close()
      }
    sharded.count()
  }

  /** Read shards + index back into `(doc_id, ids)` — the law-side
    * inverse ([[write]] then [[reconstruct]] is the identity; also the
    * shape of a distributed re-reader). Shard payloads load via
    * `binaryFile` (one bounded-size row per shard — shards are SIZED to
    * fit by construction) and equi-join to the index on the shard key;
    * each doc slices its ids out of its shard's bytes per-partition. */
  def reconstruct(spark: SparkSession, path: String): DataFrame = {
    import org.apache.spark.sql.types._
    val idx = spark.read.parquet(s"$path/index")
    // an empty corpus writes an index with zero rows and NO shard files;
    // binaryFile on a matchless glob throws, so short-circuit to the
    // empty frame with the contract schema
    if (idx.isEmpty)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row],
        StructType(Seq(StructField("doc_id", LongType),
          StructField("ids", ArrayType(IntegerType)))))
    val shards = spark.read.format("binaryFile")
      .load(s"$path/shard-*.bin")
      .select(
        regexp_extract(col("path"), "shard-(\\d+)\\.bin$", 1)
          .cast("int").as("shard"),
        col("content"))
    import spark.implicits._
    idx.join(shards, Seq("shard"))
      .select(col("doc_id"), col("offset_ids"), col("n_ids"), col("content"))
      .map { r =>
        val off = r.getLong(1).toInt * 4
        val n = r.getLong(2).toInt
        val bytes = r.getAs[Array[Byte]](3)
        val buf = ByteBuffer.wrap(bytes, off, n * 4)
          .order(ByteOrder.LITTLE_ENDIAN)
        (r.getLong(0), Array.fill(n)(buf.getInt()).toSeq)
      }.toDF("doc_id", "ids")
  }
}
