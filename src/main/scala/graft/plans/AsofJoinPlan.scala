package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native whole-operator as-of join — SURVEY §7.3 ladder step (c):
  * a custom logical node, planner strategy, and physical exec,
  * registered per-session (`GraftPlanBridge.installStrategy`) or via
  * `spark.sql.extensions=graft.GraftExtensions` on a cluster deploy.
  *
  * Semantics (identical to [[graft.ops.JoinOps.asofJoin]], certified
  * against DuckDB's native ASOF LEFT JOIN): every left row picks the
  * LATEST right row with `right.ts <= left.ts` (inclusive) within the
  * same key; left rows with no predecessor emit null right values.
  *
  * Why a physical operator beats the union+window composition: the
  * exec declares `requiredChildDistribution` (hash on key, both
  * sides) and `requiredChildOrdering` ((key, ts) ascending), so
  * Catalyst plans exactly one co-partitioned exchange per side plus
  * per-partition sorts — then the join itself is a single streaming
  * two-pointer merge holding ONE buffered right row: no union row
  * blow-up, no null-tagged columns, no window machinery, no second
  * pass to drop the right-side rows. Memory per partition is O(1)
  * beyond the sort — the operator never materializes a key group.
  */
case class AsofJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryNode {
  require(leftKey.dataType == LongType && rightKey.dataType == LongType &&
    leftTs.dataType == LongType && rightTs.dataType == LongType,
    "asof-join native operator: key and ts columns must be LongType " +
      "(epoch-micros / integer keys — the engine's event contract)")
  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Custom optimizer rule completing the extension surface: a custom
  * logical node BLOCKS Catalyst's own predicate pushdown (the built-in
  * `PushDownPredicates` only knows built-in nodes), so a filter
  * written above an as-of join would otherwise run after the join —
  * at 100 TB that is the difference between scanning a partition and
  * scanning a table. This rule pushes every conjunct that references
  * ONLY left-side columns through the node into the left child (safe:
  * each output row is one left row plus its independently-determined
  * match, so dropping left rows never changes surviving rows'
  * matches); right-side or mixed conjuncts stay above. From the left
  * child the built-in rules take over and carry the predicate to the
  * scan — PushedFilters reach parquet, asserted in JoinOpsSpec.
  * Non-deterministic conjuncts (a `rand()` sampling filter) are NEVER
  * pushed, matching Catalyst's own `PushDownPredicates` contract —
  * moving one below the join changes how many times and against which
  * row set it evaluates.
  */
object AsofJoinPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, a: AsofJoinNode) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(a.left.outputSet))
      if (pushable.isEmpty) f
      else {
        val node = a.copy(left = Filter(pushable.reduce(And), a.left))
        rest.reduceOption(And).map(Filter(_, node)).getOrElse(node)
      }
  }
}

/** Plans [[AsofJoinNode]] to [[AsofJoinExec]]; every other node falls
  * through to the built-in strategies. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lts, rts, rv) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts, rv) :: Nil
    case _ => Nil
  }
}

case class AsofJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTs: Attribute, rightTs: Attribute,
    rightVals: Seq[Attribute]) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  // hash-cluster both sides on the key (EnsureRequirements co-partitions
  // them, exactly as it does for SortMergeJoin) and sort (key, ts) —
  // the operator itself is then a single streaming merge pass.
  // AQE interaction (ProbeAsofAqe, forced-coalescing audit): AQE does
  // NOT insert coalesced shuffle reads under an unknown exec, so the
  // two sides always keep identical reducer partitioning — alignment
  // of the zipped partitions is guaranteed, at the cost of running at
  // the configured shuffle partition count (no runtime coalesce).
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lKeyOrd = left.output.indexWhere(_.exprId == leftKey.exprId)
    val lTsOrd = left.output.indexWhere(_.exprId == leftTs.exprId)
    val rKeyOrd = right.output.indexWhere(_.exprId == rightKey.exprId)
    val rTsOrd = right.output.indexWhere(_.exprId == rightTs.exprId)
    require(lKeyOrd >= 0 && lTsOrd >= 0 && rKeyOrd >= 0 && rTsOrd >= 0,
      "asof-join: key/ts attributes must come from the respective child")
    val rightSchema = right.output
    val leftSchema = left.output
    val rvAttrs = rightVals
    // bind the output projection against NULLABLE right-value attrs:
    // unmatched left rows read from an all-null row, and a
    // non-nullable binding would skip the null check and read garbage
    // zeros instead of nulls
    val rvNullable = rightVals.map(_.withNullability(true))
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val rValProj = UnsafeProjection.create(rvAttrs, rightSchema)
      val outProj = UnsafeProjection.create(outAttrs, leftSchema ++ rvNullable)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rvAttrs.size)

      new Iterator[InternalRow] {
        // one-row lookahead into the right side; `lastVals` is the
        // latest right row at-or-before the current left timestamp for
        // the CURRENT key — the operator's entire join state
        private var rBuf: InternalRow = advanceRight()
        private var lastKey = 0L
        private var haveLast = false
        private var lastVals: InternalRow = null

        private def advanceRight(): InternalRow =
          if (rIt.hasNext) rIt.next() else null

        override def hasNext: Boolean = lIt.hasNext

        override def next(): InternalRow = {
          val l = lIt.next()
          val lk = l.getLong(lKeyOrd)
          val lt = l.getLong(lTsOrd)
          if (haveLast && lastKey != lk) { haveLast = false; lastVals = null }
          var continue = rBuf != null
          while (continue) {
            val rk = rBuf.getLong(rKeyOrd)
            if (rk < lk || (rk == lk && rBuf.getLong(rTsOrd) <= lt)) {
              if (rk == lk) {
                // UnsafeProjection reuses its buffer — copy the one row
                // we retain (the only allocation per match-advance)
                lastVals = rValProj(rBuf).copy()
                lastKey = lk
                haveLast = true
              }
              rBuf = advanceRight()
              continue = rBuf != null
            } else continue = false
          }
          joined(l, if (haveLast) lastVals else nullRight)
          outProj(joined)
        }
      }
    }
  }
}
