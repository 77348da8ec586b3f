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
