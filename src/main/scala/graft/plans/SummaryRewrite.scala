package graft.plans

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Cast, Coalesce, DecimalDivideWithOverflowCheck, EqualTo, EvalMode, Expression, If, KnownNotNull, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.DecimalType

/** Summary-table (materialized-view) rewrite — the aggregate-routing
  * feature a 100 TB warehouse pairs with incremental view maintenance
  * ([[graft.ops.Merge.ivmMerge]] keeps the summary fresh; this rule makes
  * queries USE it): an `Aggregate` over the base parquet relation whose
  * grouping keys are a subset of a registered summary's dimensions and
  * whose aggregates are all derivable from it (SUM of a registered
  * measure, COUNT(*)/COUNT(col), AVG of a registered measure, grouping
  * passthroughs, and any deterministic arithmetic over those) is
  * rewritten to re-aggregate the summary frame — a few rows — instead of
  * scanning the base table.
  *
  * Narrow ON PURPOSE (the [[graft.functions.NormTextRewrite]] discipline):
  *  - the scan must have EXACTLY ONE root path and that path must be the
  *    registered base — `spark.read.parquet(base, other)` (and even
  *    `parquet(base, base)`, which doubles every row) keeps the base
  *    scan, because a summary of one path cannot answer a multi-path
  *    relation; paths key on the fully-qualified filesystem URI (scheme +
  *    authority + path), so a registration for `file:/x` can never answer
  *    a same-pathed relation on a different filesystem;
  *  - the child must be the bare base relation, an attribute-only
  *    Project of it, or ONE deterministic Filter whose references are
  *    ALL dimensions (a dims-only WHERE includes or excludes whole
  *    summary groups, so it re-targets onto the summary; any non-dim
  *    reference disqualifies, since the summary cannot answer it);
  *  - every aggregate must be a non-distinct, non-filtered SUM / MIN /
  *    MAX / AVG over an exact registered measure shape (bare column or
  *    CAST(column AS t) — matched structurally, never by SQL text),
  *    COUNT(*)/COUNT(1), or COUNT(measure); non-aggregate expression
  *    structure over those (casts, arithmetic like SUM(x)/COUNT(*),
  *    formatting) derives by recursion; one underivable leaf
  *    disqualifies the whole Aggregate;
  *  - SUM(measure) rewrites to SUM(sum_col) — exact when measures are
  *    summed in DECIMAL (addition is associative), which is why the
  *    oracle hash gate on `q_summary_rewrite` can prove rewrite ==
  *    direct; COUNT(*) rewrites to COALESCE(SUM(n_rows), 0) under
  *    [[KnownNotNull]] — the COALESCE matters on the GLOBAL aggregate
  *    (empty grouping is trivially a dims subset) over an empty summary
  *    or a dims-only filter that excludes every group, where SUM over
  *    zero rows is NULL but COUNT(*) must be 0; COUNT(measure) rewrites
  *    the same way onto the registered per-measure non-null count;
  *  - AVG(measure) — decimal measures only — reproduces Spark's own
  *    decimal Average node shape verbatim: `If(count = 0, null,
  *    DecimalDivideWithOverflowCheck(sum, count :: decimal(20,0),
  *    resultType, HALF_UP))` with sum := SUM(sum_col) re-narrowed to
  *    Average's internal sum type and count := SUM(cnt_col), so the
  *    rewritten value is bit-equal to the direct aggregation (same
  *    division, same single HALF_UP rounding at the same scale), not
  *    merely close;
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
      maxs: Map[MeasureKey, String] = Map.empty,
      /** measure shape -> summary per-measure NON-NULL count column
        * (serves COUNT(measure) and the denominator of AVG(measure)). */
      counts: Map[MeasureKey, String] = Map.empty)

  private val entries = TrieMap.empty[String, SummaryDef]

  private def sessionPrefix(spark: SparkSession): String =
    s"${spark.sparkContext.applicationId}:${System.identityHashCode(spark)}:"

  /** Register `summary` (persist it FIRST — the captured plan should be
    * the InMemoryRelation leaf) as the materialized rollup of the parquet
    * relation at `basePath` over `dims`.
    *
    * `insertOnly` declares the maintenance contract: MIN/MAX summary
    * columns are only valid when the changelog feeding the summary never
    * retracts rows (the classic IVM asymmetry — see
    * [[graft.ops.Merge.ivmMerge]]). A registration that admits deletes
    * (`insertOnly = false`) therefore must not offer `mins`/`maxs`; the
    * catalog enforces it here rather than trusting every call site. */
  def register(spark: SparkSession, basePath: String, dims: Set[String],
               measures: Map[MeasureKey, String], countCol: String,
               summary: DataFrame,
               mins: Map[MeasureKey, String] = Map.empty,
               maxs: Map[MeasureKey, String] = Map.empty,
               counts: Map[MeasureKey, String] = Map.empty,
               insertOnly: Boolean = true): Unit =
    {
      require(insertOnly || (mins.isEmpty && maxs.isEmpty),
        "a summary maintained under retractions (insertOnly = false) cannot " +
          "register MIN/MAX columns: deleting the current extremum would " +
          "require a base rescan, so served mins/maxs could be stale")
      entries.put(sessionPrefix(spark) + normalize(spark, basePath),
        SummaryDef(dims, measures, countCol,
          summary.queryExecution.optimizedPlan, mins, maxs, counts))
      // hygiene: registrations die with the run, like every persist
      graft.core.SharedFrames.onClear(() => clear(spark))
    }

  /** Fully-qualified filesystem URI (scheme + authority + path): the
    * catalog key under which `file:/x/y` and `/x/y` coincide while
    * `hdfs://nn/x/y` and `s3a://bucket/x/y` stay distinct — a
    * registration for one filesystem must never answer a same-pathed
    * relation on another. */
  private[plans] def normalize(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // rebuild from explicit components: makeQualified is not canonical
    // across input spellings ("file:/x" keeps a null authority while
    // "/x" qualifies with an empty one), so scheme/authority/path are
    // reassembled by hand to one spelling
    val u = fs.makeQualified(p).toUri
    s"${u.getScheme}://${Option(u.getAuthority).getOrElse("")}${u.getPath}"
  }

  /** Cheap per-plan bail-out: sessions that never registered a summary
    * pay no filesystem-qualification work in the optimizer rule. */
  private[plans] def hasEntries(spark: SparkSession): Boolean = {
    val prefix = sessionPrefix(spark)
    entries.keysIterator.exists(_.startsWith(prefix))
  }

  private[plans] def lookup(spark: SparkSession, rawPath: String): Option[SummaryDef] =
    entries.get(sessionPrefix(spark) + normalize(spark, rawPath))

  /** Drop every registration for `spark`'s session. */
  def clear(spark: SparkSession): Unit = {
    val prefix = sessionPrefix(spark)
    entries.keys.filter(_.startsWith(prefix)).foreach(entries.remove)
  }
}

object SummaryRewrite extends Rule[LogicalPlan] {

  /** The base-relation root paths (RAW — qualification happens at lookup)
    * plus any residual Filter condition, when the node is a bare parquet
    * relation, an attribute-only Project, or ONE Filter over either
    * (nested filters are already And-combined by the optimizer). A
    * dims-only filter is answerable from the summary — it includes or
    * excludes WHOLE groups — so it is returned for the rewriter to
    * re-target; anything else disqualifies at the match site. */
  private def baseWithFilter(plan: LogicalPlan): Option[(Seq[String], Option[Expression])] =
    plan match {
      case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
        Some((fs.location.rootPaths.map(_.toString), None))
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

  private def sumOf(c: Attribute): Expression =
    AggregateExpression(Sum(c), Complete, isDistinct = false)

  /** COUNT(*) / COUNT(measure) over the summary: SUM of the registered
    * count column, COALESCE'd to 0 — a global aggregate over an empty
    * summary (or a dims-only filter excluding every group) must yield 0,
    * not SUM's NULL. With the COALESCE in place the [[KnownNotNull]]
    * wrapper is actually true, so downstream nullability reasoning stays
    * sound. */
  private def countOf(c: Attribute): Expression =
    KnownNotNull(Coalesce(Seq(sumOf(c), Literal(0L))))

  /** AVG(measure) for DECIMAL measures, reproducing Spark's own decimal
    * [[Average]] evaluate shape verbatim (same division node, same
    * single HALF_UP rounding at the same result scale), with the
    * internal sum := SUM(sum_col) re-narrowed to Average's sum type and
    * the internal count := SUM(cnt_col). Non-decimal measures are
    * declined: their base-side sums are float accumulations whose value
    * is partition-order-dependent, so no summary column can promise
    * bit-equality. */
  private def deriveAverage(child: Expression, evalMode: EvalMode.Value,
      d: SummaryCatalog.SummaryDef,
      byName: Map[String, Attribute]): Option[Expression] =
    child.dataType match {
      case dt: DecimalType =>
        for {
          key <- measureKey(child)
          sumCol <- d.measures.get(key).flatMap(byName.get)
          cntCol <- d.counts.get(key).flatMap(byName.get)
        } yield {
          val sumType = DecimalType(math.min(dt.precision + 10, 38), dt.scale)
          val resultType = DecimalType(math.min(dt.precision + 4, 38),
            math.min(dt.scale + 4, 38))
          val sum = Cast(sumOf(sumCol), sumType)
          val cnt = Coalesce(Seq(sumOf(cntCol), Literal(0L)))
          If(EqualTo(cnt, Literal(0L)), Literal(null, resultType),
            DecimalDivideWithOverflowCheck(sum, Cast(cnt, DecimalType(20, 0)),
              resultType, null, evalMode != EvalMode.ANSI))
        }
      case _ => None
    }

  /** The aggregate-leaf derivations shared by the flat and rollup arms:
    * SUM / MIN / MAX / COUNT(measure) / AVG over a registered measure
    * shape. COUNT(*) is handled separately (it needs no measure). */
  private def deriveAggLeaf(ae: AggregateExpression,
      d: SummaryCatalog.SummaryDef,
      byName: Map[String, Attribute]): Option[Expression] =
    if (ae.isDistinct || ae.filter.nonEmpty) None
    else ae.aggregateFunction match {
      case Sum(child, _) =>
        measureKey(child).flatMap(d.measures.get).flatMap(byName.get).map(sumOf)
      case org.apache.spark.sql.catalyst.expressions.aggregate.Min(child) =>
        measureKey(child).flatMap(d.mins.get).flatMap(byName.get)
          .map(c => AggregateExpression(
            org.apache.spark.sql.catalyst.expressions.aggregate.Min(c),
            Complete, isDistinct = false))
      case org.apache.spark.sql.catalyst.expressions.aggregate.Max(child) =>
        measureKey(child).flatMap(d.maxs.get).flatMap(byName.get)
          .map(c => AggregateExpression(
            org.apache.spark.sql.catalyst.expressions.aggregate.Max(c),
            Complete, isDistinct = false))
      case Count(Seq(child)) if !child.isInstanceOf[Literal] =>
        measureKey(child).flatMap(d.counts.get).flatMap(byName.get).map(countOf)
      case Average(child, evalMode) =>
        deriveAverage(child, evalMode, d, byName)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val spark = SparkSession.getActiveSession.orNull
    if (spark == null || !SummaryCatalog.hasEntries(spark)) return plan
    // single-root-path gate: a summary of ONE path cannot answer a
    // multi-path relation — including parquet(base, base), which doubles
    // every row — so anything but exactly one root path keeps the scan
    def lookupSingle(paths: Seq[String]): Option[SummaryCatalog.SummaryDef] =
      if (paths.lengthCompare(1) == 0) SummaryCatalog.lookup(spark, paths.head)
      else None
    plan.transformUp {
      case agg @ Aggregate(groupingExprs, aggExprs,
          expand: org.apache.spark.sql.catalyst.plans.logical.Expand, _) =>
        (for {
          (paths, filterOpt) <- baseWithFilter(expand.child)
          d <- lookupSingle(paths)
          rewritten <- rewriteRollup(agg, groupingExprs, aggExprs, expand, filterOpt, d)
        } yield rewritten).getOrElse(agg)
      case agg @ Aggregate(groupingExprs, aggExprs, child, _) =>
        (for {
          (paths, filterOpt) <- baseWithFilter(child)
          d <- lookupSingle(paths)
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
    * by construction) passes through unchanged, and deterministic
    * expression structure AROUND derivable aggregates derives by
    * recursion. */
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
        case _: AttributeReference => None
        case c @ Cast(inner, _, _, _) =>
          derive(inner).map(nc => c.withNewChildren(Seq(nc)))
        case ae: AggregateExpression if isCountStar(ae) =>
          byName.get(d.countCol).map(countOf)
        // COUNT(DISTINCT dims'): kept Expand attrs survive into the
        // rewritten Expand with their replicated dim values, and
        // DISTINCT ignores the multiplicity change — pass through
        case ae: AggregateExpression if ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Count(children) if children.nonEmpty && children.forall {
                case a: AttributeReference => keptSet.contains(a)
                case _ => false
              } => Some(ae)
            case _ => None
          }
        case ae: AggregateExpression => deriveAggLeaf(ae, d, byName)
        // aggregate-free functions of the groupings (grouping()/
        // grouping_id() bit-ops over the gid, dim expressions) — constant
        // per group, so row multiplicity cannot change them
        case e if !e.exists(_.isInstanceOf[AggregateExpression]) &&
            e.deterministic && e.references.forall(keptSet.contains) =>
          Some(e)
        // deterministic structure around derivable pieces (for example
        // SUM(x) / COUNT(*), round(...), string formatting) derives
        // child-by-child; one underivable child fails the whole tree
        case e if e.deterministic && e.children.nonEmpty =>
          val kids = e.children.map(derive)
          if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get)))
          else None
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
        case a: AttributeReference =>
          if (groupNames.contains(a.name)) byName.get(a.name) else None
        case c @ Cast(inner, _, _, _) =>
          derive(inner).map(nc => c.withNewChildren(Seq(nc)))
        case ae: AggregateExpression if isCountStar(ae) =>
          byName.get(d.countCol).map(countOf)
        // COUNT(DISTINCT dims...): the summary holds exactly the base's
        // distinct dim combinations (it IS the group-by over them), and
        // DISTINCT is multiplicity-free, so the count re-targets 1:1 —
        // null dim tuples are skipped identically on both sides
        case ae: AggregateExpression if ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case Count(children) if children.nonEmpty && children.forall {
                case a: AttributeReference => d.dims.contains(a.name)
                case _ => false
              } =>
              Some(AggregateExpression(
                Count(children.map { case a: AttributeReference => byName(a.name) }),
                Complete, isDistinct = true))
            case _ => None
          }
        case ae: AggregateExpression => deriveAggLeaf(ae, d, byName)
        case l: Literal => Some(l)
        // deterministic structure around derivable pieces — the analyzer
        // guarantees bare attrs here are grouping refs, and aggregates
        // are reached at their AggregateExpression wrapper above, so
        // child-wise recursion cannot smuggle a base column through
        case e if e.deterministic && e.children.nonEmpty =>
          val kids = e.children.map(derive)
          if (kids.forall(_.isDefined)) Some(e.withNewChildren(kids.map(_.get)))
          else None
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
