package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** A WHOLE-OPERATOR extension — the last rung of the custom-operator
  * ladder (expression → aggregate → optimizer rule → physical operator):
  * a native AS-OF join planned as its own physical node instead of being
  * encoded in existing operators.
  *
  * Semantics (backward as-of, left outer): every left row is matched to
  * the LATEST right row with the same key whose time is at-or-before the
  * left row's time (optionally within `toleranceUs`); unmatched left rows
  * carry NULLs. This is the pandas `merge_asof` / DuckDB `ASOF LEFT JOIN`
  * contract the union+window encoding of `q_asof_event` implements — here
  * it is a first-class operator.
  *
  * Why a physical operator when the window encoding already runs in one
  * shuffle: the encoding materializes a UNION of both inputs, pays the
  * window machinery (frame state, null-carry columns) on every row, and
  * ties both inputs to one combined sort. The native operator asks the
  * planner for exactly what the merge needs — co-partitioning on key,
  * per-partition (key, time) order on EACH side — and then streams both
  * sorted iterators through a two-pointer merge: O(|L| + |R|) per
  * partition, one buffered right row, no union frame, no window state.
  * EnsureRequirements inserts the exchanges/sorts only when the children
  * aren't already partitioned/sorted right, so a pre-bucketed layout
  * (see `ops.Bucketing`) runs it with ZERO exchanges — the window
  * encoding can never skip its union shuffle.
  *
  * Scale: distribution is per-key like every equi-join (AQE handles the
  * partition sizing); the merge holds ONE right row at a time — state
  * does not grow with key group size. Keys and times are LongType by
  * contract (user ids, epoch micros) — the planner asserts it.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        toleranceUs: Long,
                        forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule teaching Catalyst to push filters THROUGH the custom
  * node: a deterministic predicate referencing only LEFT-side columns
  * commutes with the as-of match (it removes whole left rows; the
  * per-row match against the right side is untouched), so it moves below
  * the join where `PhysicalOperation` can carry it into the scan's
  * PushedFilters. RIGHT-side predicates must NOT push — filtering the
  * right input changes which row is "latest at-or-before" and flips
  * matches to nulls. Catalyst leaves unknown nodes alone by design; a
  * custom operator that wants scan pruning under user filters has to
  * bring its own rule — this is it (plan-guarded in ExtensionsSpec). */
object AsOfJoinFilterPushdown
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
  with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, j: AsOfJoinPlan) =>
      val leftOut = AttributeSet(j.left.output)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(leftOut))
      if (push.isEmpty) f
      else {
        val pushed = j.copy(left = Filter(push.reduce(And), j.left))
        keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}

/** Planner rule: AsOfJoinPlan → AsOfJoinExec. Injected via
  * `experimental.extraStrategies` (the public strategy hook; same
  * mechanism `SparkSessionExtensions.injectPlannerStrategy` feeds). */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      require(j.leftKey.dataType == LongType &&
        j.rightKey.dataType == LongType &&
        j.leftTime.dataType == LongType &&
        j.rightTime.dataType == LongType,
        "as_of_join: key and time columns must be LongType")
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.rightKey, j.leftTime, j.rightTime,
        j.toleranceUs, j.forward, j.output) :: Nil
    case _ => Nil
  }
}

/** Physical backward as-of join: requiredChildDistribution co-partitions
  * the sides on key, requiredChildOrdering sorts each partition by
  * (key, time) — EnsureRequirements materializes only what's missing —
  * then each partition pair streams through a two-pointer merge.
  *
  * The merge keeps ONE candidate right row (the latest at-or-before the
  * current left row): right rows are consumed monotonically because both
  * iterators share the (key, time) order, so each side is read exactly
  * once. Iterator rows are JVM-reused by the upstream sort, so the
  * buffered candidate is a copy; left rows are consumed immediately and
  * need none. */
case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                        leftKey: Expression, rightKey: Expression,
                        leftTime: Expression, rightTime: Expression,
                        toleranceUs: Long, forward: Boolean,
                        output: Seq[Attribute]) extends BinaryExecNode {

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = AsOfJoinExec.longGetter(leftKey, left.output)
    val lTime = AsOfJoinExec.longGetter(leftTime, left.output)
    val rKey = AsOfJoinExec.longGetter(rightKey, right.output)
    val rTime = AsOfJoinExec.longGetter(rightTime, right.output)
    val rightWidth = right.output.length
    val tol = toleranceUs
    val fwd = forward
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val nullRight = new GenericInternalRow(rightWidth)
      val joined = new JoinedRow
      // parents (collect, exchanges) expect UnsafeRow — flatten the
      // JoinedRow view through a result projection like SortMergeJoin
      val resultProj =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(outAttrs, outAttrs)
      // lookahead on the right stream (copied: sort iterators reuse rows)
      var rHead: InternalRow = if (rIt.hasNext) rIt.next().copy() else null
      // backward: latest right row consumed so far, with its (key, time)
      var cand: InternalRow = null
      var candKey = 0L
      var candTime = 0L
      lIt.map { l =>
        val lk = lKey(l)
        val lt = lTime(l)
        if (fwd) {
          // consume right rows strictly before (lk, lt); what remains at
          // rHead is the FIRST row at-or-after — skipped rows can never
          // match a later left row (left times only grow within the key)
          var advance = true
          while (advance && rHead != null) {
            val rk = rKey(rHead)
            if (rk < lk || (rk == lk && rTime(rHead) < lt)) {
              rHead = if (rIt.hasNext) rIt.next().copy() else null
            } else advance = false
          }
          val matched = rHead != null && rKey(rHead) == lk &&
            (tol < 0L || rTime(rHead) - lt <= tol)
          resultProj(joined(l, if (matched) rHead else nullRight))
        } else {
          // consume right rows at-or-before (lk, lt); each becomes the
          // new best candidate (later time within the key wins)
          var advance = true
          while (advance && rHead != null) {
            val rk = rKey(rHead)
            if (rk < lk || (rk == lk && rTime(rHead) <= lt)) {
              cand = rHead
              candKey = rk
              candTime = rTime(rHead)
              rHead = if (rIt.hasNext) rIt.next().copy() else null
            } else advance = false
          }
          val matched = cand != null && candKey == lk &&
            (tol < 0L || lt - candTime <= tol)
          resultProj(joined(l, if (matched) cand else nullRight))
        }
      }
    }
  }
}

object AsOfJoinExec {
  /** Primitive-access getter: a direct attribute reference reads its
    * ordinal with `getLong` (no per-row boxing — the hot path for every
    * call through [[AsOfJoin.join]]); any other expression falls back to
    * bound evaluation. Null keys/times are not supported (filter them
    * upstream) — the contract every time-series join shares. */
  private[plans] def longGetter(e: Expression,
                                out: Seq[Attribute]): InternalRow => Long =
    e match {
      case a: Attribute if out.exists(_.exprId == a.exprId) =>
        val ord = out.indexWhere(_.exprId == a.exprId)
        r => r.getLong(ord)
      case _ =>
        val bound = BindReferences.bindReference(e, out)
        r => bound.eval(r).asInstanceOf[Long]
    }
}

/** DataFrame-level entry point for the native as-of join. */
object AsOfJoin {
  /** As-of LEFT join: each `left` row picks, among right rows with
    * `leftKey == rightKey`, the LATEST at-or-before (`direction =
    * "backward"`, the default) or the EARLIEST at-or-after
    * (`"forward"`) its time — within `toleranceUs` (negative =
    * unbounded). Right columns are null on no match. Key/time columns
    * must be LongType and non-null, and the right side must be UNIQUE
    * per (key, time) — among duplicate-time rows the sort leaves peer
    * order unspecified, so dedup first (the event queries take
    * max(event_id) per instant). Column names must be disjoint
    * across the sides (project/rename first — the operator concatenates
    * the schemas). */
  def join(leftDf: DataFrame, rightDf: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           toleranceUs: Long = -1L,
           direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"as_of_join: unknown direction '$direction'")
    val spark = leftDf.sparkSession
    AsOfJoinStrategy.install(spark)
    val l = leftDf.queryExecution.analyzed
    val r = rightDf.queryExecution.analyzed
    def attr(p: LogicalPlan, name: String): Attribute =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"as_of_join: no column '$name' in ${p.output.map(_.name)}"))
    val dup = l.output.map(_.name).toSet
      .intersect(r.output.map(_.name).toSet)
    require(dup.isEmpty, s"as_of_join: colliding column names $dup")
    org.apache.spark.sql.graft.PlanShim.ofRows(spark,
      AsOfJoinPlan(l, r, attr(l, leftKey), attr(r, rightKey),
        attr(l, leftTime), attr(r, rightTime), toleranceUs,
        forward = direction == "forward"))
  }

  implicit private class StrategyInstall(self: AsOfJoinStrategy.type) {
    def install(spark: org.apache.spark.sql.SparkSession): Unit = {
      val cur = spark.experimental.extraStrategies
      if (!cur.contains(AsOfJoinStrategy))
        spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
    }
  }
}
