package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format breadth beyond CSV+parquet: ORC and JSON-lines
  * round-trips preserving schema and values. (Avro is not bundled in this
  * Spark distribution's jars, so it is intentionally not claimed.) */
class FormatsSpec extends SparkSuite {

  private def sample = core.Tables.lineitem(spark, sf)
    .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    .filter(col("l_quantity") >= 45)

  test("ORC sink/source round-trip preserves schema and values") {
    val dir = Files.createTempDirectory("graftorc").toFile.getAbsolutePath
    val in = sample
    in.write.mode("overwrite").orc(s"$dir/li.orc")
    val back = spark.read.orc(s"$dir/li.orc")
    assert(back.schema == in.schema)
    val key = (r: org.apache.spark.sql.Row) => (r.getLong(0), r.getInt(1))
    assert(back.collect().map(key).sorted.toSeq == in.collect().map(key).sorted.toSeq)
  }

  test("parquet mergeSchema reads a column-drifted dataset (late columns null)") {
    import org.apache.spark.sql.functions._
    // batch 1 lacks the column batch 2 adds — the accretive-corpus shape
    val dir = java.nio.file.Files.createTempDirectory("graftdrift").toString
    spark.createDataFrame(Seq((1L, "a"), (2L, "b"))).toDF("id", "text")
      .write.parquet(s"$dir/b=1")
    spark.createDataFrame(Seq((3L, "c", 0.9))).toDF("id", "text", "quality")
      .write.parquet(s"$dir/b=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet == Set("id", "text", "quality", "b"))
    val byId = merged.collect()
      .map(r => r.getLong(r.fieldIndex("id")) ->
        Option(r.get(r.fieldIndex("quality")))).toMap
    assert(byId(1L).isEmpty && byId(2L).isEmpty, "pre-drift rows must read null")
    assert(byId(3L).contains(0.9))
  }

  test("compaction rewrites many small files into bounded large ones") {
    import org.apache.spark.sql.functions._
    val in = java.nio.file.Files.createTempDirectory("graftsmall").toString
    val out = java.nio.file.Files.createTempDirectory("graftcompact").toString
    // 40 tiny files across 2 partitions
    spark.range(2000)
      .withColumn("part", (col("id") % 2).cast("int"))
      .repartition(20)
      .write.mode("overwrite").partitionBy("part").parquet(in)
    def parquetFiles(p: String) = {
      val d = new java.io.File(p)
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk)
        else if (f.getName.endsWith(".parquet")) Seq(f) else Nil
      walk(d)
    }
    val before = parquetFiles(in).size
    assert(before >= 20, s"fixture should be fragmented, got $before files")
    graft.ingest.Ingest.compact(spark, in, out, Seq("part"), maxRecordsPerFile = 10000)
    val after = parquetFiles(out).size
    assert(after <= 2, s"expected one file per partition, got $after")
    assert(spark.read.parquet(out).count() == 2000)
  }

  test("token-shard sink: write + reconstruct is the identity, offsets contiguous") {
    import org.apache.spark.sql.functions._
    val tmp = java.nio.file.Files.createTempDirectory("graftshards")
      .toFile.getAbsolutePath
    // deterministic token ids from the real corpus; empty-text docs give
    // zero-length id arrays (the offset math must absorb them)
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        expr("transform(filter(split(trim(text), '\\\\s+'), w -> w <> ''), " +
          "w -> cast(pmod(hash(w), 50000) as int))").as("ids"))
    val n = graft.sinks.TokenShards.write(docs, nShards = 4, tmp)
    assert(n == docs.count())
    // exactly nShards binary files on disk
    val bins = new java.io.File(tmp).listFiles()
      .filter(_.getName.matches("shard-\\d+\\.bin")).sortBy(_.getName)
    assert(bins.length == 4, bins.mkString(", "))
    // per-shard byte size == 4 * total ids on that shard (offsets
    // contiguous, nothing dropped or double-written)
    val idx = spark.read.parquet(s"$tmp/index")
    val sizes = idx.groupBy("shard").agg(sum("n_ids").as("total"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    bins.foreach { f =>
      val k = f.getName.stripPrefix("shard-").stripSuffix(".bin").toInt
      assert(f.length() == sizes(k) * 4, s"shard $k size ${f.length()}")
    }
    // identity law: reconstruct == input, row for row
    val back = graft.sinks.TokenShards.reconstruct(spark, tmp)
    // plan shape: the re-reader is index-repartition + per-partition
    // positioned reads — NO join, and no relation over the shard files
    // themselves (a whole-shard binaryFile row was the round-10 scale
    // hole: every doc row's projection copied its shard's full payload)
    val rplan = back.queryExecution.optimizedPlan
    assert(!rplan.exists(
      _.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join]),
      s"reconstruct must not join shard payloads onto doc rows:\n$rplan")
    assert(rplan.collectLeaves().forall {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        fs.location.rootPaths.forall(!_.getName.startsWith("shard-"))
      case _ => true
    }, s"no relation may load shard binaries as rows:\n$rplan")
    assert(back.exceptAll(docs).isEmpty && docs.exceptAll(back).isEmpty)
    // edges: a single shard round-trips; an empty corpus writes a
    // zero-row index and reconstructs to the empty frame (no throw on
    // the matchless shard glob)
    val one = s"$tmp-one"
    assert(graft.sinks.TokenShards.write(docs.limit(7), 1, one) == 7L)
    assert(graft.sinks.TokenShards.reconstruct(spark, one).count() == 7L)
    val none = s"$tmp-none"
    assert(graft.sinks.TokenShards.write(docs.limit(0), 4, none) == 0L)
    val empty = graft.sinks.TokenShards.reconstruct(spark, none)
    assert(empty.count() == 0L &&
      empty.columns.toSeq == Seq("doc_id", "ids"))
    graft.core.SharedFrames.clear()
  }

  test("JSON-lines sink/source round-trip with explicit schema") {
    val dir = Files.createTempDirectory("graftjson").toFile.getAbsolutePath
    val in = sample
    in.write.mode("overwrite").json(s"$dir/li.json")
    // schema-bound read (inference is a scan of its own — never at scale)
    val back = spark.read.schema(in.schema).json(s"$dir/li.json")
    assert(back.schema == in.schema)
    assert(back.count() == in.count())
    val s1 = back.agg(sum(col("l_quantity"))).head().getDouble(0)
    val s2 = in.agg(sum(col("l_quantity"))).head().getDouble(0)
    assert(s1 == s2)
  }
}
