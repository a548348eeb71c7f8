package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Transparent AGGREGATE-OVER-MATERIALIZED-VIEW rewrite — the lakehouse
  * optimization that makes stored rollups useful without query changes:
  * a registered (base location → MV) mapping lets the optimizer answer
  * `SELECT keys, SUM(x), COUNT(*) FROM base GROUP BY keys` from the
  * stored MV table instead of scanning the base — at 100 TB the
  * difference between a full base scan per dashboard refresh and a
  * bounded rollup read. This is SURVEY §7.3 ladder step (c) applied to
  * the OPTIMIZER surface: a `Rule[LogicalPlan]` injected next to the
  * as-of pushdown rules ([[AsofJoinPushdown]]), installed in-process
  * via `GraftColumnBridge.installRule` or at session build via
  * `GraftExtensions`.
  *
  * Soundness contract (deliberately strict — a rewrite that fires on a
  * pattern it cannot prove is a WRONG-ANSWER bug, not a missed
  * optimization):
  *   - the query's grouping keys must equal the MV's keys EXACTLY
  *     (same grain; coarser grains would need re-aggregation of
  *     mergeable state — [[graft.ops.MvOps]] is that other half);
  *   - every output must be a bare grouping key, `SUM(col)` for a
  *     registered measure, or `COUNT(*)` with a registered count
  *     column — no DISTINCT, no FILTER clauses, no other functions;
  *   - the aggregate's child must be the registered base scan (bare, or
  *     under pure column-pruning Projects);
  *   - output attribute ids/names/types are preserved via aliases onto
  *     the MV columns, so parent operators are untouched;
  *   - FRESHNESS is the registrant's contract: register (or refresh)
  *     the MV before querying, deregister when it goes stale — the
  *     rule cannot see base-table mutations.
  */
object MvRewrite {

  /** One registered view: MV catalog-table name, the exact grouping
    * keys, base-measure→MV-column names for SUMs, and the MV column
    * holding COUNT(*). */
  final case class MvDef(
      mvTable: String,
      keys: Seq[String],
      sums: Map[String, String],
      countCol: Option[String])

  private[plans] val registry = new ConcurrentHashMap[String, MvDef]()

  /** Root-path normalization: scheme + trailing slashes stripped, so
    * `file:/x/y` (location root) matches the `/x/y` the reader used. */
  private[plans] def normalize(p: String): String =
    p.stripPrefix("file:").replaceAll("/+$", "")

  def register(basePath: String, d: MvDef): Unit =
    registry.put(normalize(basePath), d)

  def deregister(basePath: String): Unit = registry.remove(normalize(basePath))

  /** Idempotently install [[MvRewriteRule]] on an existing session. */
  def install(spark: SparkSession): Unit =
    org.apache.spark.sql.GraftPlanBridge.installRule(spark, MvRewriteRule)
}

object MvRewriteRule extends Rule[LogicalPlan] {
  import MvRewrite._

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp {
      case agg: Aggregate => tryRewrite(agg).getOrElse(agg)
    }

  /** The registered MvDef of the aggregate's child, if that child is
    * the registered single-root base scan (possibly under pure
    * attribute-only Projects inserted by column pruning). */
  private def baseDef(child: LogicalPlan): Option[MvDef] = child match {
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths.toSeq match {
        case Seq(p) => Option(registry.get(normalize(p.toString)))
        case _ => None
      }
      case _ => None
    }
    case p: Project if p.projectList.forall(_.isInstanceOf[AttributeReference]) =>
      baseDef(p.child)
    case _ => None
  }

  private def tryRewrite(agg: Aggregate): Option[LogicalPlan] =
    for {
      d <- baseDef(agg.child)
      groupNames <- attributeNames(agg.groupingExpressions)
      if groupNames.sorted == d.keys.sorted
      spark = SparkSession.active
      if spark.catalog.tableExists(d.mvTable)
      mv = EliminateSubqueryAliases(
        spark.table(d.mvTable).queryExecution.analyzed)
      mvOut = mv.output.map(a => a.name -> a).toMap
      mappedOpts = agg.aggregateExpressions
        .map(mapOutput(_, groupNames.toSet, d, mvOut))
      if mappedOpts.forall(_.isDefined)
    } yield Project(mappedOpts.map(_.get), mv)

  private def attributeNames(
      es: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Option[Seq[String]] = {
    val names = es.map {
      case a: AttributeReference => Some(a.name)
      case _ => None
    }
    if (names.forall(_.isDefined)) Some(names.map(_.get)) else None
  }

  /** The MV column answering ONE AggregateExpression (plain SUM of a
    * registered measure / COUNT(*)), type-checked — None bails the
    * whole rewrite. */
  private def mapAgg(
      ae: AggregateExpression, d: MvDef,
      mvOut: Map[String, Attribute]): Option[Attribute] = {
    if (ae.isDistinct || ae.filter.nonEmpty) return None
    val srcName = ae.aggregateFunction match {
      case s: Sum => s.child match {
        case c: AttributeReference => d.sums.get(c.name)
        case _ => None
      }
      case c: Count if c.children == Seq(Literal(1)) => d.countCol
      case _ => None
    }
    srcName.flatMap(mvOut.get).filter(_.dataType == ae.dataType)
  }

  /** Map ONE aggregate output onto MV columns, preserving the output's
    * name, exprId, and type. Outputs are arbitrary expressions over
    * aggregates and grouping keys (the optimizer's CollapseProject
    * folds parent projections like `round(sum(x), 2)` INTO the
    * aggregate's output list before extra rules run), so this
    * substitutes every inner AggregateExpression / grouping attribute
    * with its MV column and then proves nothing unmapped is left —
    * any surviving AggregateExpression or non-MV attribute bails.
    */
  private def mapOutput(
      ne: NamedExpression, groupNames: Set[String], d: MvDef,
      mvOut: Map[String, Attribute]): Option[NamedExpression] = {
    val aggsMapped = ne.transformDown {
      case ae: AggregateExpression => mapAgg(ae, d, mvOut).getOrElse(ae)
    }
    val keysMapped = aggsMapped.transformUp {
      case a: AttributeReference
          if groupNames.contains(a.name) &&
            mvOut.get(a.name).exists(_.dataType == a.dataType) =>
        mvOut(a.name)
    }
    val unmappedAgg = keysMapped.collectFirst {
      case ae: AggregateExpression => ae
    }.isDefined
    val mvAttrs = mvOut.values.map(_.exprId).toSet
    val foreignAttr = keysMapped.references.exists(r => !mvAttrs.contains(r.exprId))
    if (unmappedAgg || foreignAttr) None
    else keysMapped match {
      // a bare grouping key became the MV's attribute — re-alias onto
      // the ORIGINAL exprId so parent operators stay resolved
      case a: Attribute => Some(Alias(a, ne.name)(exprId = ne.exprId))
      case other: NamedExpression => Some(other)
      case e => Some(Alias(e, ne.name)(exprId = ne.exprId))
    }
  }
}
