package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed order statistics — global rank by VALUE order
  * without a global sort.
  *
  * The naive formulation, `row_number() OVER (ORDER BY v)`, is the
  * classic scale cliff: an empty PARTITION BY funnels the entire table
  * through ONE reducer. [[valueRanked]] is the value-ordered sibling of
  * [[Sampling.rankedBy]]'s two-level rank: the leading key must follow
  * the VALUE order (a hash bucket would scramble it), so level one is a
  * fixed integer GRID over the value range —
  *
  *   1. cell = (v − min) · cells / (max − min + 1) — order-preserving
  *      integer arithmetic, so `(cell, v, id)` sorts exactly like
  *      `(v, id)`; row_number within each cell is a `cells`-way parallel
  *      window;
  *   2. + the total count of all lower cells — a ≤`cells`-row aggregate,
  *      cumsum'd on that tiny frame (the only partition-less window, on
  *      ≤`cells` rows by construction) and broadcast back.
  *
  * The result is bit-identical to `row_number() OVER (ORDER BY v, id)`
  * (law-tested in OrderStatsSpec; the DuckDB oracle for
  * `q_equidepth_hist` IS that window). min/max come from one 1-row
  * aggregate — an audited bounded collect, same class as the IVF
  * centroid seeds.
  *
  * Skew: equal-width cells concentrate heavy TIES of one value into one
  * cell (rank windows cannot be salted — rank order inside a tie run is
  * the tiebreak id's). `cells` (default 4096) bounds how bad the
  * concentration is relative to the value spread; a production pipeline
  * over pathological tie distributions sizes `cells` so the hottest
  * value's run fits a reducer, which is the same envelope any engine's
  * order-statistics pass lives in.
  *
  * This primitive upgrades the `percentile(...)` built-in the describe
  * suite uses (exact but per-group value-buffering) to corpus-scale
  * EXACT quantiles: rank arithmetic replaces value buffering entirely.
  */
object OrderStats {

  /** Grid cells for the two-level value rank (= the parallelism of the
    * per-cell sort). */
  val GridCells = 4096

  /** Adds `val_rank` = exact 1-based rank of (`value`, `id`) under
    * ascending order. `value` and `id` must be non-null integral columns;
    * the value RANGE times `cells` must fit in a signed 64-bit (true for
    * any monetary/cents or token-count domain; require()d here). */
  def valueRanked(df: DataFrame, value: String, id: String,
                  cells: Int = GridCells): DataFrame =
    valueRankedBy(df, Nil, value, id, cells)

  /** Per-stratum exact value rank: `val_rank` restarts at 1 within each
    * combination of `strata`. The grid is shared across strata (lo/hi are
    * global — one 1-row aggregate regardless of group count), but every
    * window and offset is keyed by (strata, cell), so a hot stratum still
    * spreads over `cells` reducers. Bit-identical to `row_number() OVER
    * (PARTITION BY strata ORDER BY v, id)` (OrderStatsSpec law). */
  def valueRankedBy(df: DataFrame, strata: Seq[String], value: String,
                    id: String, cells: Int = GridCells): DataFrame =
    rankedWithOffsets(df, strata, value, id, cells)._1

  /** The rank plus the per-(strata, cell) count frame it was built from —
    * the tiny frame doubles as a pre-aggregated total/size source, so
    * consumers that need N (quantile positions, histogram buckets) read
    * it instead of paying another full-data pass. */
  private[graft] def rankedWithOffsets(
      df: DataFrame, strata: Seq[String], value: String,
      id: String, cells: Int = GridCells): (DataFrame, DataFrame) = {
    // NOTE: the primitive reads `df` three times (the min/max grid probe
    // is a driver action, then the cell-count aggregation and the rank
    // window each scan it). Callers whose input is EXPENSIVE to
    // re-derive (a hashed sample, a join+aggregate rollup) should hand
    // in a persisted frame; a blanket persist here measured SLOWER for
    // the common case of a cheap projection over an already-cached scan.
    val Row2 = df.agg(min(col(value).cast("long")).as("lo"),
      max(col(value).cast("long")).as("hi")).head()
    if (Row2.isNullAt(0)) {
      // Schema-correct empty offsets frame — the same groupBy shape over
      // zero rows — so consumers (equiDepthHistogram's agg, lenDeciles'
      // groupBy) resolve their columns instead of hitting the zero-column
      // emptyDataFrame.
      val offsets0 = df.limit(0)
        .withColumn("__cell", lit(0))
        .groupBy((strata :+ "__cell").map(col): _*)
        .agg(count(lit(1)).as("__cell_n"))
        .withColumn("__offset", lit(0L))
      return (df.withColumn("val_rank", lit(null).cast("long")), offsets0)
    }
    val (lo, hi) = (Row2.getLong(0), Row2.getLong(1))
    val span = hi - lo + 1
    require(span > 0 && span <= Long.MaxValue / cells,
      s"value range [$lo,$hi] x $cells cells overflows the grid arithmetic")
    // `div`, not `/`: Column./ is DOUBLE division, and doubles misbucket
    // once (v - lo) * cells crosses 2^53
    val withCell = df.withColumn("__cell",
      expr(s"CAST(((`$value` - ${lo}L) * ${cells}L) div ${span}L AS INT)"))
    val keys = strata :+ "__cell"
    val localW = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(value), col(id))
    val offsetW = Window.partitionBy(strata.map(col): _*)
      .orderBy(col("__cell"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = withCell
      .groupBy(keys.map(col): _*).agg(count(lit(1)).as("__cell_n"))
      .withColumn("__offset",
        coalesce(sum(col("__cell_n")).over(offsetW), lit(0L)))
    val ranked = withCell
      .withColumn("__local", row_number().over(localW).cast("long"))
      .join(broadcast(offsets.drop("__cell_n")), keys)
      .withColumn("val_rank", col("__offset") + col("__local"))
      .drop("__cell", "__local", "__offset")
    (ranked, offsets)
  }

  /** Exact equi-depth histogram: rows land in `buckets` rank bands of
    * near-equal size (sizes differ by at most 1), each band reported with
    * its count and value envelope. `bucket = ((rank−1)·buckets) div N` —
    * pure integer arithmetic on the exact rank, so boundaries are
    * reproducible to the row (the histogram an optimizer's statistics
    * pass or a corpus length-distribution report needs, with none of the
    * tie drift a quantile-boundary formulation has). */
  def equiDepthHistogram(df: DataFrame, value: String, id: String,
                         buckets: Int = 10,
                         cells: Int = GridCells): DataFrame = {
    val (ranked, offsets) = rankedWithOffsets(df, Nil, value, id, cells)
    // N comes from the already-aggregated cell counts (a <=cells-row
    // frame), not another full-data pass
    val total = offsets.agg(sum(col("__cell_n")).as("__n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("bucket",
        expr(s"CAST(((val_rank - 1) * ${buckets}L) div __n AS INT) + 1"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(value)).as("lo"),
        max(col(value)).as("hi"),
        // DECIMAL interior: a 64-bit sum of per-row longs overflows near
        // 1e12 rows x 1e7 cents; DECIMAL(38,0) partials stay exact and
        // match DuckDB's HUGEINT promotion
        sum(col(value).cast("decimal(38,0)")).as("total"))
  }
}
