package graft

/** Smoke + shape checks for every registered query at sf0.001. The real
  * correctness gate is the driver's DuckDB oracle at sf0.01 (pre-flighted
  * locally by scripts/check.py); these specs catch regressions fast. */
class QueriesSpec extends SparkSuite {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs and returns rows at sf0.001") {
    try {
      SparkEntry.queries.foreach { case (name, fn) =>
        val df = fn(spark, sf)
        val n = df.count()
        assert(n > 0, s"$name returned 0 rows")
      }
    } finally graft.core.SharedFrames.clear()
  }

  test("every query is oracle-gated (no rows-only checks)") {
    val missing = SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet)
    assert(missing.isEmpty,
      s"queries without a DuckDB oracle (driver records a weaker rows-only check): $missing")
  }

  test("no query output contains timestamp columns (parity rule)") {
    import org.apache.spark.sql.types.{TimestampType, TimestampNTZType}
    SparkEntry.queries.foreach { case (name, fn) =>
      val bad = fn(spark, sf).schema.fields
        .filter(f => f.dataType == TimestampType || f.dataType == TimestampNTZType)
      assert(bad.isEmpty,
        s"$name outputs timestamp columns ${bad.map(_.name).toSeq} — emit epoch micros instead")
    }
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val missing = SparkEntry.oracleSql.keySet.diff(qs)
    assert(missing.isEmpty, s"oracle keys without queries: $missing")
  }

  test("query names are unique across groups (no silent Map overwrite)") {
    // derived from SparkEntry.groups (not a hand-copied list) so a newly
    // added group can't silently fall out of the uniqueness check
    val names = SparkEntry.groups.flatMap(_.queries.keys)
    val dupes = names.groupBy(identity).filter(_._2.size > 1).keys
    assert(dupes.isEmpty, s"duplicate query names: $dupes")
    assert(names.size == SparkEntry.queries.size)
  }

  test("shared frames actually share (same instance per session+dir)") {
    // a typo'd cache key would silently rebuild the frame per consumer,
    // losing the build-once design AND the bench's cost attribution;
    // SharedFrames.cached returns the identical DataFrame on a hit
    SparkEntry.sharedFrames.foreach { case (name, fn) =>
      assert(fn(spark, sf) eq fn(spark, sf),
        s"shared frame '$name' rebuilt on second call — cache key broken")
    }
    // shared names must not collide across groups
    val names = SparkEntry.sharedFrames.map(_._1)
    assert(names.distinct.size == names.size,
      s"duplicate shared-frame names: ${names.diff(names.distinct)}")
    graft.core.SharedFrames.clear()
  }

  test("distress scores are bounded and categorized") {
    val rows = queries.CoreQueries.distressScores(spark, sf).collect()
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("distress_score"))) {
        val s = r.getDouble(r.fieldIndex("distress_score"))
        assert(s >= 0.0 && s <= 100.0)
      }
      val cat = r.getString(r.fieldIndex("risk_category"))
      assert(Set("Healthy", "Watch", "Elevated", "High", "Severe", "Unknown")(cat))
    }
  }
}
