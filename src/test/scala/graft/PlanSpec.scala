package graft

import org.apache.spark.sql.execution.FormattedMode

/** Guards the scale-critical plan properties PLANS.md documents, so a
  * refactor can't silently regress them:
  *  - predicate + projection pushdown reaching the parquet scan;
  *  - broadcast (not shuffle) joins for dimension lookups;
  *  - no cartesian product anywhere in the registered query surface.
  */
class PlanSpec extends SparkSuite {

  private def formatted(name: String): String =
    SparkEntry.queries(name)(spark, sf)
      .queryExecution.explainString(FormattedMode)

  test("q_scan_project: filter and projection are pushed to the parquet scan") {
    val plan = formatted("q_scan_project")
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(l_quantity,45.0)"),
      s"quantity predicate not pushed:\n${plan.take(1200)}")
    // the read schema must carry ONLY the four projected columns
    val read = plan.linesIterator.find(_.trim.startsWith("ReadSchema")).getOrElse("")
    assert(Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
      .forall(read.contains), s"projection not pruned: $read")
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"scan reads unprojected columns: $read")
  }

  test("q_star_join: every dimension joins as broadcast, none as shuffle SMJ") {
    val plan = formatted("q_star_join")
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
    assert(!plan.contains("SortMergeJoin"),
      s"dimension lookup fell back to a shuffle join:\n${plan.take(1200)}")
  }

  test("no registered query plans a cartesian product") {
    // the two deliberate scalar-broadcast crossJoins in the library are
    // 1-row broadcasts, which Spark plans as BroadcastNestedLoopJoin with
    // a 1-row build side — a true CartesianProduct node is always a bug
    SparkEntry.queries.keys.foreach { name =>
      val plan = formatted(name)
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct")
    }
  }
}
