package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.ops.ParquetFooter

/** Footer-reader laws against a SECOND writer: the oracle gate parses
  * pyarrow-written testdata; here Spark's own parquet writer (different
  * implementation, different stats habits) round-trips through the same
  * from-scratch thrift walk — with REAL nulls and a forced row-group
  * split, the two things the single-group all-non-null testdata can't
  * exercise. */
class ParquetFooterSpec extends SparkSuite {

  import spark.implicits._

  test("spark-written file: num_rows, per-chunk values, and null counts") {
    val dir = Files.createTempDirectory("pqfooter").toString
    val df = (0L until 1000L).map(i =>
      (i, if (i % 3 == 0) None else Some(s"v$i"), i.toDouble))
      .toDF("id", "s", "x")
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", "4096") // force multiple row groups
      .parquet(dir)
    val file = new java.io.File(dir).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val fm = ParquetFooter.parse(Files.readAllBytes(file.toPath))
      .getOrElse(fail("footer parse failed"))
    assert(fm.numRows == 1000L)
    val byPath = fm.chunks.groupBy(_.path)
    assert(byPath.keySet == Set("id", "s", "x"))
    // values and nulls sum across row groups to the data facts
    assert(byPath("id").map(_.numValues).sum == 1000L)
    assert(byPath("s").map(_.numValues).sum == 1000L)
    val nullsS = byPath("s").flatMap(_.nullCount).sum
    assert(nullsS == (0L until 1000L).count(_ % 3 == 0))
    assert(byPath("id").flatMap(_.nullCount).sum == 0L)
    // physical types from Spark's mapping
    assert(byPath("id").head.physType == "INT64")
    assert(byPath("s").head.physType == "BYTE_ARRAY")
    assert(byPath("x").head.physType == "DOUBLE")
    // the forced tiny block size must actually have split groups
    assert(byPath("id").size >= 2,
      s"expected multiple row groups, got ${byPath("id").size}")
  }

  test("truncated and non-parquet bytes refuse honestly") {
    assert(ParquetFooter.parse(Array[Byte](1, 2, 3)).isEmpty)
    val b = Files.readAllBytes(
      Paths.get("/root/testdata/sf0.001/region.parquet"))
    assert(ParquetFooter.parse(b.dropRight(2)).isEmpty)
    assert(ParquetFooter.parse(b).exists(_.numRows == 5L))
  }
}
