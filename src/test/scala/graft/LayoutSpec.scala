package graft

import java.nio.file.Files

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ops.Layout
import graft.queries.SamplingQueries

/** Z-order layout: the Morton-code expression must match a bit-twiddled
  * reference, and the layout must deliver the multi-dimensional pruning
  * it exists for — measured directly from the per-file bounding boxes. */
class LayoutSpec extends SparkSuite {

  private def mortonRef(x: Long, y: Long, bits: Int = 16): Long =
    (0 until bits).map { i =>
      (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }.sum

  test("interleave matches the bit-twiddled Morton reference") {
    import spark.implicits._
    val pairs = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (40000L, 1L))
    val got = pairs.toDF("x", "y")
      .withColumn("z", Layout.interleave(col("x"), col("y")))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (x, y) =>
      assert(got((x, y)) === mortonRef(x, y), s"($x, $y)")
    }
  }

  /** Wikipedia xy→d transcription (the public-domain reference walk). */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    val n = 1L << bits
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbert distance: bijective on the full grid, unit-step adjacent") {
    import spark.implicits._
    val bits = 4
    val n = 1 << bits
    val cells = for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)
    val got = Layout.withHilbertD(cells.toDF("xb", "yb"), bits)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // matches the reference walk everywhere
    cells.foreach { case (x, y) =>
      assert(got((x, y)) === hilbertRef(bits, x, y), s"($x, $y)")
    }
    // bijection onto [0, n^2)
    val ds = got.values.toSeq.sorted
    assert(ds === (0L until n.toLong * n).toSeq)
    // THE Hilbert property Z-order lacks: consecutive distances are
    // Manhattan-adjacent cells — no jumps anywhere on the curve
    val byD = got.map(_.swap)
    (0L until n.toLong * n - 1).foreach { d =>
      val (x1, y1) = byD(d); val (x2, y2) = byD(d + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L, s"jump at d=$d")
    }
  }

  test("hilbert layout boxes are no worse than z-order on the same data") {
    val li = Tables.lineitem(spark, sf).select(col("l_partkey"), col("l_suppkey"))
    val filesLog2 = 6
    def areaSum(rows: Array[org.apache.spark.sql.Row]): BigInt =
      rows.map(r => BigInt(r.getAs[Long]("x_max") - r.getAs[Long]("x_min") + 1) *
        BigInt(r.getAs[Long]("y_max") - r.getAs[Long]("y_min") + 1)).sum
    val z = Layout.layoutSummary(
      Layout.withZValue(li, "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", filesLog2).collect()
    val h = Layout.hilbertSummary(
      Layout.withHilbertValue(li, "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", filesLog2).collect()
    // same rows land in both layouts
    assert(z.map(_.getAs[Long]("n_rows")).sum === h.map(_.getAs[Long]("n_rows")).sum)
    // summed bounding-box area = expected files touched by a uniform
    // point query; hilbert must not regress z-order's locality
    assert(areaSum(h) <= areaSum(z),
      s"hilbert boxes ${areaSum(h)} worse than z ${areaSum(z)}")
  }

  test("z layout prunes on the secondary dimension; single-column sort cannot") {
    val li = Tables.lineitem(spark, sf).select(col("l_partkey"), col("l_suppkey"))
    val filesLog2 = 6
    val zFiles = Layout.layoutSummary(
      Layout.withZValue(li, "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", filesLog2).collect()

    // x-sorted layout into the same number of files (ntile over the sort)
    val nFiles = 1 << filesLog2
    val xFiles = li
      .withColumn("file_id", ntile(nFiles).over(Window.orderBy("l_partkey")))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min("l_suppkey").as("y_min"), max("l_suppkey").as("y_max"))
      .collect()

    // same data in both layouts
    assert(zFiles.map(_.getAs[Long]("n_rows")).sum ===
      xFiles.map(_.getAs[Long]("n_rows")).sum)

    // a predicate on y alone (l_suppkey = 5): count files whose y-box
    // intersects — the files a footer-stats reader must open
    def hits(rows: Array[org.apache.spark.sql.Row]): Int =
      rows.count(r => r.getAs[Long]("y_min") <= 5L && r.getAs[Long]("y_max") >= 5L)
    val xHits = hits(xFiles.map(r => r)) // x-sort: every file spans all of y
    val zHits = hits(zFiles)
    assert(xHits === xFiles.length, "x-sorted files should all span y")
    assert(zHits * 4 <= zFiles.length,
      s"z layout should prune >=75% of files on a y predicate, hit $zHits/${zFiles.length}")
  }

  test("physical z-ordered write: file count, sortedness, and read-back fidelity") {
    val tmp = Files.createTempDirectory("graftz").toFile.getAbsolutePath + "/zorder"
    val li = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey"))
    Layout.writeZOrdered(li, "l_partkey", "l_suppkey", tmp, nFiles = 8)

    val files = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 8)

    val back = spark.read.parquet(tmp)
    assert(back.count() === li.count())
    // every file's rows are z-sorted (row groups get tight min/max stats)
    val unsorted = back
      .withColumn("f", input_file_name())
      .withColumn("prev", lag(col("zval"), 1).over(
        Window.partitionBy("f").orderBy(monotonically_increasing_id())))
      .filter(col("prev") > col("zval"))
      .count()
    assert(unsorted === 0L)
    // predicate read-back equals the same filter on the source
    val got = back.filter(col("l_partkey") === 7 && col("l_suppkey") === 3)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val exp = li.filter(col("l_partkey") === 7 && col("l_suppkey") === 3)
      .select("l_orderkey", "l_linenumber")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(exp.nonEmpty)
    assert(got === exp)
  }

  test("compaction plan equals a naive in-memory bin packer") {
    val target = 128L
    // the same deterministic inventory q_compact_plan derives
    val inv = core.Tables.part(spark, sf)
      .select(col("p_brand"), col("p_partkey")).collect()
      .map { r =>
        val k = r.getLong(1)
        val h = (k * 37 + 11) % 100
        val mb = if (h < 70) 1 + h % 24
          else if (h < 90) 32 + (h - 70) * 3
          else 128 + (h - 90) * 16
        (r.getString(0), k, mb)
      }
    // naive plan: per partition, smalls size-desc/id-asc, cum-div bins
    val want = inv.groupBy(_._1).flatMap { case (part, fs) =>
      val smalls = fs.filter(_._3 < target).sortBy(f => (-f._3, f._2))
      var cum = 0L
      val binned = smalls.map { case (_, id, mb) =>
        cum += mb; (((cum - mb) / target), id, mb)
      }
      val bins = binned.groupBy(_._1).map { case (b, xs) =>
        (part, b, xs.length.toLong, xs.map(_._3).sum,
          xs.map(_._2).min, xs.map(_._2).max)
      }
      val skipped = fs.filter(_._3 >= target)
      val skipRow = if (skipped.nonEmpty)
        Seq((part, -1L, skipped.length.toLong, skipped.map(_._3).sum,
          skipped.map(_._2).min, skipped.map(_._2).max))
      else Nil
      bins ++ skipRow
    }.toSet
    val got = SamplingQueries.queries("q_compact_plan")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == want)
    // greedy-fill guarantee: every non-last bin in a partition holds at
    // least target - (max small size - 1) bytes and at most target +
    // (max small size - 1)
    val rows = got.toSeq.filter(_._2 >= 0)
    val lastBin = rows.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    rows.foreach { case (part, bin, _, total, _, _) =>
      assert(total <= target + 88, s"$part/$bin overfilled: $total")
      if (bin < lastBin(part))
        assert(total >= target - 88, s"$part/$bin underfilled: $total")
    }
  }

  test("zone-skip report: pruning is lossless and 2-d layouts beat the x-sort") {
    val rows = SparkEntry.queries("q_zone_skip")(spark, sf).collect()
    assert(rows.length == 12) // 3 layouts x 4 probes
    rows.foreach { r =>
      // losslessness: every matching row lives in a scanned file
      assert(r.getLong(4) >= r.getLong(5),
        s"${r.getString(0)} probe ${r.getInt(1)}: scanned ${r.getLong(4)} < match ${r.getLong(5)}")
      assert(r.getLong(3) <= r.getLong(2)) // files_hit <= files_total
    }
    // the 2-d locality layouts scan no more rows than the x-only sort
    // (per-corpus totals: the xsort boxes span the full y domain, so a
    // rectangle probe can never prune them on y)
    val scanned = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(4)).sum).toMap
    assert(scanned("hilbert") <= scanned("xsort"),
      s"hilbert ${scanned("hilbert")} vs xsort ${scanned("xsort")}")
    assert(scanned("zorder") <= scanned("xsort"),
      s"zorder ${scanned("zorder")} vs xsort ${scanned("xsort")}")
  }
}
