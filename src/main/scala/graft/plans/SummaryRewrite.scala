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
  *  - the child must be the bare base relation (or an attribute-only
  *    Project of it) — any residual filter/expression disqualifies, since
  *    a WHERE on a non-dimension cannot be answered from the summary;
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
      /** measure shape -> summary MIN column (min of mins is exact). */
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

  /** The base-relation paths of a plan node, when it is a bare parquet
    * relation or an attribute-only Project over one. */
  private def baseRelationPaths(plan: LogicalPlan): Seq[String] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      fs.location.rootPaths.map(p => SummaryCatalog.normalize(p.toString))
    case Project(projectList, child) if projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseRelationPaths(child)
    case _ => Seq.empty
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
      case agg @ Aggregate(groupingExprs, aggExprs, child, _)
          if baseRelationPaths(child).nonEmpty =>
        val defOpt = baseRelationPaths(child).iterator
          .flatMap(p => SummaryCatalog.lookup(spark, p))
          .nextOption()
        defOpt.flatMap(d => rewrite(agg, groupingExprs, aggExprs, d))
          .getOrElse(agg)
    }
  }

  private def rewrite(agg: Aggregate, groupingExprs: Seq[Expression],
      aggExprs: Seq[NamedExpression],
      d: SummaryCatalog.SummaryDef): Option[LogicalPlan] = {
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
        Aggregate(gAttrs.map(a => byName(a.name)), na, spliced)
      }
    }
  }
}
