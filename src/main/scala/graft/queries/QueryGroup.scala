package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries: each key has a Spark
  * implementation and (when SQL-expressible) an equivalent DuckDB oracle.
  * `SparkEntry` aggregates all groups.
  *
  * Cross-engine parity rules used throughout (see SURVEY.md §4 pitfalls):
  *  - monetary aggregates: SUM over DECIMAL(18,2) then cast DOUBLE — exact
  *    and bit-identical in Spark and DuckDB regardless of add order;
  *  - computed doubles (ratios, CAGR, scores): round(_, 4..6) to absorb
  *    sub-ulp libm differences;
  *  - weights in weighted means are dyadic (0.5/0.25/...) so their double
  *    sums are exact in both engines;
  *  - every result ends in a total ORDER BY on a unique key;
  *  - DuckDB year() returns BIGINT -> always CAST(... AS INTEGER) to match
  *    Spark's IntegerType;
  *  - DuckDB regexp_replace needs the 'g' flag to match Spark's
  *    replace-all semantics;
  *  - portable hashing is md5-only (same hex both engines); integer slices
  *    of digests via ('0x' || substr(md5(x), ...))::INT in DuckDB ==
  *    conv(substring(md5(x), ...), 16, 10) in Spark;
  *  - integer bit ops (>>, &, xor/^, bit_count, 1 << b) are exact and
  *    identical cross-engine — fingerprint pipelines (SimHash) are built
  *    ONLY from md5 + bit ops for this reason;
  *  - custom hash arithmetic wider than 64 bits (the winnowing polynomial
  *    mod 2^61-1) replays in DuckDB HUGEINT, which keeps multi-term
  *    products exact where BIGINT would overflow;
  *  - strings rendered from numbers go through DECIMAL, never
  *    double->string (double formatting differs across engines; decimal
  *    formatting does not) — see q_display_format;
  *  - iterative fixpoints (connected components) are checked against a
  *    closed-form SQL equivalent (recursive-CTE transitive closure): the
  *    fixpoint must be unique so iteration count cannot affect results.
  */
trait QueryGroup {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  /** DuckDB SQL per query key; omit keys that are not SQL-expressible
    * (driver falls back to a rows-only check). */
  def oracle: Map[String, String]
  /** Named shared-frame builders ([[graft.core.SharedFrames.cached]]
    * intermediates reused by several queries). The bench runner
    * materializes these up front and reports their build times separately,
    * so per-query numbers measure marginal cost — not whichever query
    * happened to run first paying a pipeline-wide build. A Seq (not a
    * Map): declaration order is DEPENDENCY order, so each build time is
    * attributable to its own stage — Scala Maps above 4 entries silently
    * stop preserving insertion order. */
  def shared: Seq[(String, (SparkSession, String) => DataFrame)] = Seq.empty
}
