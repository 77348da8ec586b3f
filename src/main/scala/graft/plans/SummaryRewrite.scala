package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Expression, KnownNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Summary-table (materialized-view) rewrite — the aggregate-routing
  * feature a 100 TB warehouse pairs with incremental view maintenance
  * ([[graft.ops.Merge.ivmMerge]] keeps the summary fresh; this rule makes
  * queries USE it): an `Aggregate` over the base parquet relation whose
  * grouping keys are a subset of a registered summary's dimensions and
  * whose aggregates are all derivable from it (SUM of a registered
  * measure, COUNT(*), grouping passthroughs) is rewritten to re-aggregate
  * the summary frame — a few rows — instead of scanning the base table.
  *
  * Narrow ON PURPOSE (the [[graft.functions.NormTextRewrite]] discipline):
  *  - the child must be the bare base relation, an attribute-only
  *    Project of it, or ONE deterministic Filter whose references are
  *    ALL dimensions (a dims-only WHERE includes or excludes whole
  *    summary groups, so it re-targets onto the summary; any non-dim
  *    reference disqualifies, since the summary cannot answer it);
  *  - every aggregate must be a non-distinct, non-filtered SUM / MIN /
  *    MAX over an exact registered measure shape (bare column or
  *    CAST(column AS t) — matched structurally, never by SQL text) or
  *    COUNT(*)/COUNT(1), optionally under one outer Cast; one
  *    underivable aggregate disqualifies the whole Aggregate;
  *  - SUM(measure) rewrites to SUM(sum_col) — exact when measures are
  *    summed in DECIMAL (addition is associative), which is why the
  *    oracle hash gate on `q_summary_rewrite` can prove rewrite ==
  *    direct; COUNT(*) rewrites to SUM(n_rows) under [[KnownNotNull]]
  *    (every summary group has >= 1 row) so nullability does not widen;
  *  - rewritten outputs keep the ORIGINAL exprIds and dataTypes (a Cast
  *    re-narrows the widened decimal-sum-of-sums), so parent operators
  *    resolve untouched.
  *
  * The spliced summary plan is captured at registration time AFTER the
  * frame is persisted, so it is an InMemoryRelation leaf (re-instanced
  * per splice — no exprId collisions) and can never re-trigger the rule:
  * the rewrite reaches a fixed point in one application. Registration is
  * session-keyed like [[graft.core.SharedFrames]]. */
object SummaryCatalog {

  /** (column name, cast-type signature or "" for a bare column). */
  type MeasureKey = (String, String)

  case class SummaryDef(
      dims: Set[String],
      /** measure shape -> summary SUM column name. */
      measures: Map[MeasureKey, String],
      /** summary COUNT(*) column name. */
      countCol: String,
      plan: LogicalPlan,
      /** measure shape -> summary MIN column (min of mins is exact;
        * note [[graft.ops.Merge.ivmMerge]]'s scope note — min/max
        * columns are insert-only-maintainable, unlike the sums). */
      mins: Map[MeasureKey, String] = Map.empty,
      /** measure shape -> summary MAX column (max of maxes is exact). */
      maxs: Map[MeasureKey, String] = Map.empty)

  private val entries = TrieMap.empty[String, SummaryDef]

  private def sessionKey(spark: SparkSession, path: String): String =
    s"${spark.sparkContext.applicationId}:${System.identityHashCode(spark)}:$path"

  /** Register `summary` (persist it FIRST — the captured plan should be
    * the InMemoryRelation leaf) as the materialized rollup of the parquet
    * relation at `basePath` over `dims`. */
  def register(spark: SparkSession, basePath: String, dims: Set[String],
               measures: Map[MeasureKey, String], countCol: String,
               summary: DataFrame,
               mins: Map[MeasureKey, String] = Map.empty,
               maxs: Map[MeasureKey, String] = Map.empty): Unit =
    {
      entries.put(sessionKey(spark, normalize(basePath)),
        SummaryDef(dims, measures, countCol,
          summary.queryExecution.optimizedPlan, mins, maxs))
      // hygiene: registrations die with the run, like every persist
      graft.core.SharedFrames.onClear(() => clear(spark))
    }

  /** Scheme-free absolute path — `file:/x/y` and `/x/y` name the same
    * relation (registration strings vs FileIndex rootPaths). */
  private[plans] def normalize(path: String): String =
    new org.apache.hadoop.fs.Path(path).toUri.getPath

  private[plans] def lookup(spark: SparkSession, path: String): Option[SummaryDef] =
    entries.get(sessionKey(spark, path))

  /** Drop every registration for `spark`'s session. */
  def clear(spark: SparkSession): Unit = {
    val prefix = s"${spark.sparkContext.applicationId}:${System.identityHashCode(spark)}:"
    entries.keys.filter(_.startsWith(prefix)).foreach(entries.remove)
  }
}

object SummaryRewrite extends Rule[LogicalPlan] {

  /** The base-relation paths plus any residual Filter condition, when
    * the node is a bare parquet relation, an attribute-only Project, or
    * ONE Filter over either (nested filters are already And-combined by
    * the optimizer). A dims-only filter is answerable from the summary —
    * it includes or excludes WHOLE groups — so it is returned for the
    * rewriter to re-target; anything else disqualifies at the match
    * site. */
  private def baseWithFilter(plan: LogicalPlan): Option[(Seq[String], Option[Expression])] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((fs.location.rootPaths.map(p => SummaryCatalog.normalize(p.toString)), None))
      case Project(projectList, child)
          if projectList.forall(_.isInstanceOf[AttributeReference]) =>
        baseWithFilter(child)
      case org.apache.spark.sql.catalyst.plans.logical.Filter(cond, child) =>
        baseWithFilter(child) match {
          case Some((paths, None)) => Some((paths, Some(cond)))
          case _ => None
        }
      case _ => None
    }

  private def measureKey(e: Expression): Option[SummaryCatalog.MeasureKey] = e match {
    case a: AttributeReference => Some((a.name, ""))
    case Cast(a: AttributeReference, dt, _, _) => Some((a.name, dt.simpleString))
    case _ => None
  }

  private def isCountStar(ae: AggregateExpression): Boolean = ae.aggregateFunction match {
    case Count(Seq(Literal(_, _))) => !ae.isDistinct && ae.filter.isEmpty
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.getActiveSession.orNull
    if (spark == null) return plan
    plan.transformUp {
      case agg @ Aggregate(groupingExprs, aggExprs,
          expand: org.apache.spark.sql.catalyst.plans.logical.Expand, _) =>
        (for {
          (paths, filterOpt) <- baseWithFilter(expand.child)
          d <- paths.iterator.flatMap(p => SummaryCatalog.lookup(spark, p)).nextOption()
          rewritten <- rewriteRollup(agg, groupingExprs, aggExprs, expand, filterOpt, d)
        } yield rewritten).getOrElse(agg)
      case agg @ Aggregate(groupingExprs, aggExprs, child, _) =>
        (for {
          (paths, filterOpt) <- baseWithFilter(child)
          d <- paths.iterator.flatMap(p => SummaryCatalog.lookup(spark, p)).nextOption()
          rewritten <- rewrite(agg, groupingExprs, aggExprs, filterOpt, d)
        } yield rewritten).getOrElse(agg)
    }
  }

  /** ROLLUP / CUBE / GROUPING SETS over the base relation — Catalyst
    * lowers them to `Aggregate(dims' + gid, aggs, Expand(rows, out,
    * base))` where each Expand row replays the measures and nulls out
    * the collapsed dims. The summary answers these exactly like the
    * flat case: every Expand row's per-group content is the same whole
    * set of rollup groups, just fewer physical rows per group.
    *
    * Classification keys on the observed invariant that Expand reuses
    * the CHILD attr ids for plain passthroughs and mints fresh ids for
    * the grouping outputs: output attrs ∈ child.outputSet are measure
    * passthroughs (replaced by the summary's data columns), the rest
    * (dims' + spark_grouping_id) are KEPT with their ids, so the parent
    * Aggregate's grouping refs — and any grouping()/grouping_id()
    * bit-op expressions over the gid — resolve untouched. If a future
    * Spark stops reusing ids, classification drifts and the aggregate
    * derivation simply fails to match — the rewrite falls back to the
    * base scan, never to a wrong plan. Kept positions may only carry a
    * base DIM attr (re-targeted by name), a null, or the gid literal in
    * each row; aggregates derive exactly as in the flat case; any other
    * aggregate-free expression over kept attrs (functions of the
    * groupings, per the analyzer's own rule — multiplicity-independent
    * by construction) passes through unchanged. */
  private def rewriteRollup(agg: Aggregate, groupingExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      expand: org.apache.spark.sql.catalyst.plans.logical.Expand,
      filterOpt: Option[Expression],
      d: SummaryCatalog.SummaryDef): Option[LogicalPlan] = {
    if (filterOpt.exists(f => !f.deterministic ||
        !f.references.forall(a => d.dims.contains(a.name)))) return None
    val spliced = d.plan match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
    val byName = spliced.output.map(a => a.name -> a).toMap
    val childOut = expand.child.outputSet
    val keptIdx = expand.output.zipWithIndex.collect {
      case (a, i) if !childOut.contains(a) => i
    }
    val keptAttrs = keptIdx.map(expand.output)
    val keptSet = org.apache.spark.sql.catalyst.expressions.AttributeSet(keptAttrs)
    // groupings must be exactly kept Expand outputs
    if (!groupingExprs.forall {
      case a: AttributeReference => keptSet.contains(a)
      case _ => false
    }) return None
    // kept projection elements: base dim attr / null / literal only
    val mappedRows: Option[Seq[Seq[Expression]]] = {
      val rows = expand.projections.map { row =>
        val elems = keptIdx.map(row)
        val mapped = elems.map {
          case a: AttributeReference if childOut.contains(a) =>
            if (d.dims.contains(a.name)) byName.get(a.name) else None
          case l @ Literal(_, _) => Some(l)
          case _ => None
        }
        if (mapped.forall(_.isDefined)) Some(mapped.map(_.get)) else None
      }
      if (rows.forall(_.isDefined)) Some(rows.map(_.get)) else None
    }
    mappedRows.flatMap { rows =>
      val dataCols = spliced.output.filterNot(a => d.dims.contains(a.name))
      val newOutput = dataCols ++ keptAttrs
      val newProjections = rows.map(r => (dataCols: Seq[Expression]) ++ r)
      val source = filterOpt match {
        case Some(cond) =>
          val retargeted = cond.transform {
            case a: AttributeReference => byName(a.name)
          }
          org.apache.spark.sql.catalyst.plans.logical.Filter(retargeted, spliced)
        case None => spliced
      }
      val newExpand = org.apache.spark.sql.catalyst.plans.logical.Expand(
        newProjections, newOutput, source)

      def derive(e: Expression): Option[Expression] = e match {
        case a: AttributeReference if keptSet.contains(a) => Some(a)
        case c @ Cast(inner, _, _, _) =>
          derive(inner).map(nc => c.withNewChildren(Seq(nc)))
        case ae: AggregateExpression if isCountStar(ae) =>
          byName.get(d.countCol).map { cnt =>
            KnownNotNull(AggregateExpression(Sum(cnt), Complete, isDistinct = false))
          }
        case ae: AggregateExpression =>
          ae.aggregateFunction match {
            case Sum(child, _) if !ae.isDistinct && ae.filter.isEmpty =>
              measureKey(child).flatMap(d.measures.get).flatMap(byName.get)
                .map(c => AggregateExpression(Sum(c), Complete, isDistinct = false))
            case org.apache.spark.sql.catalyst.expressions.aggregate.Min(child)
                if !ae.isDistinct && ae.filter.isEmpty =>
              measureKey(child).flatMap(d.mins.get).flatMap(byName.get)
                .map(c => AggregateExpression(
                  org.apache.spark.sql.catalyst.expressions.aggregate.Min(c),
                  Complete, isDistinct = false))
            case org.apache.spark.sql.catalyst.expressions.aggregate.Max(child)
                if !ae.isDistinct && ae.filter.isEmpty =>
              measureKey(child).flatMap(d.maxs.get).flatMap(byName.get)
                .map(c => AggregateExpression(
                  org.apache.spark.sql.catalyst.expressions.aggregate.Max(c),
                  Complete, isDistinct = false))
            case _ => None
          }
        // aggregate-free functions of the groupings (grouping()/
        // grouping_id() bit-ops over the gid, dim expressions) — constant
        // per group, so row multiplicity cannot change them
        case e if !e.exists(_.isInstanceOf[AggregateExpression]) &&
            e.deterministic && e.references.forall(keptSet.contains) =>
          Some(e)
        case _ => None
      }

      val newAggs: Option[Seq[NamedExpression]] =
        aggExprs.foldLeft(Option(Vector.empty[NamedExpression])) {
          case (acc, orig) => acc.flatMap { v =>
            derive(orig match {
              case Alias(inner, _) => inner
              case other => other
            }).map { rewritten =>
              val named: NamedExpression = orig match {
                // untouched passthrough (kept grouping attr): no
                // self-referential alias
                case a: AttributeReference if rewritten == a => a
                case _ =>
                  val typed =
                    if (rewritten.dataType == orig.dataType) rewritten
                    else Cast(rewritten, orig.dataType)
                  Alias(typed, orig.name)(exprId = orig.exprId)
              }
              v :+ named
            }
          }
        }
      newAggs.map(na => Aggregate(groupingExprs, na, newExpand))
    }
  }

  private def rewrite(agg: Aggregate, groupingExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression], filterOpt: Option[Expression],
      d: SummaryCatalog.SummaryDef): Option[LogicalPlan] = {
    // a residual filter must touch ONLY dimensions (then it includes or
    // excludes whole summary groups) and be deterministic
    if (filterOpt.exists(f => !f.deterministic ||
        !f.references.forall(a => d.dims.contains(a.name)))) return None
    // fresh instance per splice: no exprId collisions across call sites
    val spliced = d.plan match {
      case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
        m.newInstance().asInstanceOf[LogicalPlan]
      case other => other
    }
    val byName = spliced.output.map(a => a.name -> a).toMap

    val groupAttrs: Option[Seq[AttributeReference]] =
      if (groupingExprs.forall {
        case a: AttributeReference => d.dims.contains(a.name)
        case _ => false
      }) Some(groupingExprs.map(_.asInstanceOf[AttributeReference])) else None

    groupAttrs.flatMap { gAttrs =>
      val groupNames = gAttrs.map(_.name).toSet

      def derive(e: Expression): Option[Expression] = e match {
        case a: AttributeReference if groupNames.contains(a.name) =>
          byName.get(a.name)
        case c @ Cast(inner, _, _, _) =>
          derive(inner).map(nc => c.withNewChildren(Seq(nc)))
        case ae: AggregateExpression if isCountStar(ae) =>
          byName.get(d.countCol).map { cnt =>
            KnownNotNull(AggregateExpression(Sum(cnt), Complete, isDistinct = false))
          }
        case ae: AggregateExpression =>
          (ae.aggregateFunction match {
            case Sum(child, _) if !ae.isDistinct && ae.filter.isEmpty =>
              measureKey(child).flatMap(d.measures.get).flatMap(byName.get)
                .map(c => AggregateExpression(Sum(c), Complete, isDistinct = false))
            // min of per-group mins / max of per-group maxes are exact
            case org.apache.spark.sql.catalyst.expressions.aggregate.Min(child)
                if !ae.isDistinct && ae.filter.isEmpty =>
              measureKey(child).flatMap(d.mins.get).flatMap(byName.get)
                .map(c => AggregateExpression(
                  org.apache.spark.sql.catalyst.expressions.aggregate.Min(c),
                  Complete, isDistinct = false))
            case org.apache.spark.sql.catalyst.expressions.aggregate.Max(child)
                if !ae.isDistinct && ae.filter.isEmpty =>
              measureKey(child).flatMap(d.maxs.get).flatMap(byName.get)
                .map(c => AggregateExpression(
                  org.apache.spark.sql.catalyst.expressions.aggregate.Max(c),
                  Complete, isDistinct = false))
            case _ => None
          })
        case _ => None
      }

      val newAggs: Option[Seq[NamedExpression]] =
        aggExprs.foldLeft(Option(Vector.empty[NamedExpression])) {
          case (acc, orig) => acc.flatMap { v =>
            derive(orig match {
              case Alias(inner, _) => inner
              case other => other
            }).map { rewritten =>
              val typed =
                if (rewritten.dataType == orig.dataType) rewritten
                else Cast(rewritten, orig.dataType)
              v :+ Alias(typed, orig.name)(exprId = orig.exprId)
            }
          }
        }

      newAggs.map { na =>
        val source = filterOpt match {
          case Some(cond) =>
            val retargeted = cond.transform {
              case a: AttributeReference => byName(a.name)
            }
            org.apache.spark.sql.catalyst.plans.logical.Filter(retargeted, spliced)
          case None => spliced
        }
        Aggregate(gAttrs.map(a => byName(a.name)), na, source)
      }
    }
  }
}
