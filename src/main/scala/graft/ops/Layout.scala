package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional file pruning.
  *
  * A 100 TB table can only be scanned selectively if file/row-group
  * min-max statistics line up with the query predicates. Sorting by ONE
  * column gives perfect pruning on that column and none on any other;
  * interleaving the bits of two (rank-scaled) columns into a Z-value and
  * range-partitioning on it gives every file a small bounding BOX in
  * (x, y) space, so predicates on EITHER dimension — or both — prune.
  * This is the layout technique behind Delta/Iceberg `OPTIMIZE ZORDER BY`,
  * built here from plain Spark primitives:
  *
  *   1. scale each dimension to a `bits`-bit integer domain using the
  *      global min/max (a 1-row broadcast aggregate — no sort, no sample);
  *   2. interleave bits with codegen'd shift/mask arithmetic (16 two-term
  *      expressions, no UDF);
  *   3. `repartitionByRange` on the Z-value (Spark's range partitioner
  *      samples boundaries; each partition = one output file with a tight
  *      Z-interval, hence a tight (x, y) box) + `sortWithinPartitions` so
  *      row groups within a file are boxed too.
  *
  * The whole pipeline is deterministic integer math on the data — the
  * DuckDB oracle replays it bit for bit (`q_zorder`), and LayoutSpec
  * measures the pruning win directly: fraction of files whose box
  * intersects a point/box query under Z layout vs a single-column sort.
  *
  * Reference analog: the reference keeps its CSV snapshots in arrival
  * order (`chat_acreage_bot.py` append log), so every lookup is a full
  * scan; this is the layout its 100 TB successor needs.
  */
object Layout {

  /** Bits per dimension; the Z-value occupies 2*bits (32) bits. */
  val ZBits = 16

  /** Scale `c` from [lo, hi] onto the integer domain [0, 2^bits): exact
    * integer arithmetic (no doubles), so engines agree bit for bit. */
  private def scaleTo(c: Column, lo: Column, hi: Column, bits: Int): Column =
    call_function("div",
      (c.cast("long") - lo) * (1L << bits), hi - lo + lit(1L))

  /** Interleave two `bits`-bit non-negative longs: x takes even bit
    * positions, y odd. Terms have disjoint bits so `+` == bitwise-or —
    * summed because the oracle replays this as a SUM over a bit index. */
  def interleave(xb: Column, yb: Column, bits: Int = ZBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)

  /** Add `xb`, `yb` (rank-scaled dims) and `zval` for (`xCol`, `yCol`).
    * The min/max extremes are a broadcast 1-row cross join, same shape at
    * any scale. Rows with a NULL dimension get a NULL zval — filter or
    * impute them before the layout write (a null key has no box). */
  def withZValue(df: DataFrame, xCol: String, yCol: String,
                 bits: Int = ZBits): DataFrame = {
    val ext = df.agg(
      min(col(xCol).cast("long")).as("z_xmin"), max(col(xCol).cast("long")).as("z_xmax"),
      min(col(yCol).cast("long")).as("z_ymin"), max(col(yCol).cast("long")).as("z_ymax"))
    df.crossJoin(broadcast(ext))
      .withColumn("xb", scaleTo(col(xCol), col("z_xmin"), col("z_xmax"), bits))
      .withColumn("yb", scaleTo(col(yCol), col("z_ymin"), col("z_ymax"), bits))
      .withColumn("zval", interleave(col("xb"), col("yb"), bits))
      .drop("z_xmin", "z_xmax", "z_ymin", "z_ymax")
  }

  /** Static file assignment by Z-prefix: the top `filesLog2` bits of the
    * Z-value. Unlike `repartitionByRange` (boundaries depend on sampling)
    * this is a pure function of the row, so the oracle can replay it; the
    * write path below uses range partitioning for even file sizes. */
  def fileByPrefix(zval: Column, filesLog2: Int, bits: Int = ZBits): Column =
    shiftright(zval, 2 * bits - filesLog2)

  /** Per-file layout summary: row count and the (x, y) bounding box.
    * `box area / domain area` summed over files IS the expected scan
    * fraction for a uniformly-placed point query — the pruning metric. */
  def layoutSummary(withZ: DataFrame, xCol: String, yCol: String,
                    filesLog2: Int, bits: Int = ZBits): DataFrame =
    withZ
      .withColumn("file_id", fileByPrefix(col("zval"), filesLog2, bits))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol).cast("long")).as("x_min"), max(col(xCol).cast("long")).as("x_max"),
        min(col(yCol).cast("long")).as("y_min"), max(col(yCol).cast("long")).as("y_max"))
      .orderBy("file_id")

  /** Physical Z-ordered write: range-partition on the Z-value (one file
    * per partition, tight Z-interval each) and sort within partitions so
    * parquet row-group min/max stats on BOTH source columns are tight.
    * Readers then prune files AND row groups from footer stats alone. */
  def writeZOrdered(df: DataFrame, xCol: String, yCol: String, path: String,
                    nFiles: Int, bits: Int = ZBits): Unit =
    withZValue(df, xCol, yCol, bits)
      .drop("xb", "yb")
      .repartitionByRange(nFiles, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(path)

  /** Hilbert-curve distance for rank-scaled coords `xb`, `yb` in
    * [0, 2^bits) — the locality curve Delta and Iceberg moved to after
    * Z-order: consecutive Hilbert positions are ALWAYS Manhattan-adjacent
    * cells (the Z curve jumps across the domain at every power-of-two
    * boundary), so range-partitioned files get strictly tighter bounding
    * boxes for the same file count (LayoutSpec measures both on the same
    * data).
    *
    * The classic per-level rotate/reflect walk (the public xy→d
    * formulation): at each bit level i, the quadrant (rx, ry) contributes
    * 4^i · q with q = ry if rx = 0 else 3 − ry (the (3·rx) XOR ry table
    * written as pure arithmetic — no engine-specific xor operator), and
    * the lower bits reflect/swap into the rotated frame. Expressed as ONE
    * `aggregate` higher-order expression over the bit levels: the
    * accumulator is a bound variable, so the expression stays LINEAR in
    * `bits` (a column-substitution unrolling would double the tree at
    * every level), and the whole thing is codegen'd integer arithmetic —
    * no UDF. Reflection is n−1−coord (n = 2^bits, all-ones mask): low
    * bits complement exactly regardless of not-yet-consumed high bits,
    * which s−1−coord would get wrong whenever coord >= s.
    *
    * UNROLLED into one pair of projections per bit level rather than an
    * `aggregate` higher-order expression: HOFs are CodegenFallback —
    * interpreted per row with a struct allocation per level, the HOF
    * form benched 15× slower than z-order on the same rows. Each
    * level's rotate/reflect CASE is non-cheap and referenced more than
    * once by the next level, so CollapseProject keeps the levels as
    * separate whole-stage-codegen'd projections instead of inlining
    * them into a 3^bits-node expression tree. Input columns `xb`, `yb`;
    * appends `hval`. */
  def withHilbertD(df: DataFrame, bits: Int = ZBits): DataFrame = {
    // State-machine form of the same walk: the rotate/reflect mutations
    // compose in the abelian group {identity, swap, complement, both}
    // (swap and bitwise complement commute), so instead of rewriting the
    // coordinates each level the state is TWO booleans (__w swap, __n
    // complement) applied to the RAW bits — effective bits
    //   ex = __n xor bit_i(__w ? yb : xb), ey = __n xor bit_i(__w ? xb : yb)
    // digit = (3·ex) xor ey, and the transitions xor in the level's
    // mutation: __w flips when ey = 0, __n flips when additionally
    // ex = 1. One select per level keeps the chain as separate
    // codegen'd projections (each level's CASEs are non-cheap and
    // multiply-referenced, so CollapseProject cannot inline the chain
    // into an exponential tree). Bit-identical to the coordinate-
    // rewriting walk (LayoutSpec full-grid law vs the reference).
    var cur = df
      .withColumn("__w", lit(false))
      .withColumn("__n", lit(false))
      .withColumn("hval", lit(0L))
    for (i <- bits - 1 to 0 by -1) {
      val rx = shiftright(col("xb").cast("long"), i).bitwiseAND(lit(1L))
      val ry = shiftright(col("yb").cast("long"), i).bitwiseAND(lit(1L))
      val ex = when(col("__n"), lit(1L) - when(col("__w"), ry).otherwise(rx))
        .otherwise(when(col("__w"), ry).otherwise(rx))
      val ey = when(col("__n"), lit(1L) - when(col("__w"), rx).otherwise(ry))
        .otherwise(when(col("__w"), rx).otherwise(ry))
      val pass = cur.columns.filterNot(Set("__w", "__n", "hval")).map(col)
      cur = cur.select(pass ++ Seq(
        (col("__w") =!= (ey === 0L)).as("__w"),
        (col("__n") =!= (ey === 0L && ex === 1L)).as("__n"),
        (col("hval") + lit(1L << (2 * i)) *
          when(ex === 0L, ey).otherwise(lit(3L) - ey)).as("hval")): _*)
    }
    cur.drop("__w", "__n")
  }

  /** Add `xb`, `yb` and the Hilbert distance `hval` for (`xCol`, `yCol`)
    * — [[withZValue]]'s twin with the better curve. Same broadcast 1-row
    * extremes, same NULL-dimension caveat. */
  def withHilbertValue(df: DataFrame, xCol: String, yCol: String,
                       bits: Int = ZBits): DataFrame = {
    val ext = df.agg(
      min(col(xCol).cast("long")).as("z_xmin"), max(col(xCol).cast("long")).as("z_xmax"),
      min(col(yCol).cast("long")).as("z_ymin"), max(col(yCol).cast("long")).as("z_ymax"))
    withHilbertD(
      df.crossJoin(broadcast(ext))
        .withColumn("xb", scaleTo(col(xCol), col("z_xmin"), col("z_xmax"), bits))
        .withColumn("yb", scaleTo(col(yCol), col("z_ymin"), col("z_ymax"), bits)),
      bits)
      .drop("z_xmin", "z_xmax", "z_ymin", "z_ymax")
  }

  /** Per-file layout summary for the Hilbert layout: files = top
    * `filesLog2` bits of the distance (the [[fileByPrefix]] rule on
    * `hval`), each with row count and (x, y) bounding box. */
  def hilbertSummary(withH: DataFrame, xCol: String, yCol: String,
                     filesLog2: Int, bits: Int = ZBits): DataFrame =
    withH
      .withColumn("file_id", fileByPrefix(col("hval"), filesLog2, bits))
      .groupBy("file_id")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol).cast("long")).as("x_min"), max(col(xCol).cast("long")).as("x_max"),
        min(col(yCol).cast("long")).as("y_min"), max(col(yCol).cast("long")).as("y_max"))
      .orderBy("file_id")

  /** Small-file compaction plan — the OPTIMIZE step every long-lived
    * lakehouse table needs: within each partition directory, files below
    * `target` bytes are packed size-descending (first-fit-decreasing
    * order) into bins via cumulative division — bin
    * ⌊(cumsum − size) / target⌋, the greedy fill real table formats
    * plan with (each bin lands in [target, target + max small size));
    * files already ≥ `target` are left alone and reported as one
    * `bin_id = −1` summary row per partition. Deterministic: the fill
    * order is (size desc, file id asc), a total order.
    *
    * Scale shape: the only non-aggregation step is the per-PARTITION
    * cumulative window — keyed by the partition directory, so no
    * single-reducer cliff; per-directory file counts are retention-
    * bounded in any real table. Output is bin-granular (≪ file count). */
  def compactionPlan(files: DataFrame, partCol: String, fileCol: String,
                     bytesCol: String, target: Long): DataFrame = {
    require(target > 0, "target must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(partCol)
      .orderBy(col(bytesCol).desc, col(fileCol))
    val bins = files.filter(col(bytesCol) < target)
      .withColumn("__cum", sum(col(bytesCol)).over(w))
      .withColumn("bin_id",
        expr(s"(__cum - $bytesCol) div ${target}L"))
      .groupBy(col(partCol), col("bin_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col(fileCol)).as("min_file"),
        max(col(fileCol)).as("max_file"))
    val skipped = files.filter(col(bytesCol) >= target)
      .groupBy(col(partCol))
      .agg(count(lit(1)).as("n_files"),
        sum(col(bytesCol)).as("total_bytes"),
        min(col(fileCol)).as("min_file"),
        max(col(fileCol)).as("max_file"))
      .withColumn("bin_id", lit(-1L))
      .select(col(partCol), col("bin_id"), col("n_files"),
        col("total_bytes"), col("min_file"), col("max_file"))
    bins.unionByName(skipped)
      .withColumn("fill_pct", expr(s"(total_bytes * 100) div ${target}L"))
      .withColumn("compacted", col("bin_id") >= 0)
  }
}
