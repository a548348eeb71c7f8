package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan regression tests: the scale posture (pushdown,
  * pruning, broadcast, top-k) must be visible in the executed plan, not
  * assumed. A plan that silently regresses to a global sort or a
  * shuffled dimension join is a perf bug even while results stay
  * correct.
  */
class PlanSpec extends AnyFunSuite {
  import TestSpark._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("filters push into the parquet scan") {
    val p = plan("q_pricing_summary")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"),
      s"missing pushed filter:\n$p")
  }

  test("scans prune to the referenced columns only") {
    val p = plan("q_top_parts")
    assert(p.contains("ReadSchema: struct<l_partkey:bigint,l_quantity:double>"),
      s"column pruning regressed:\n$p")
  }

  test("dimension joins broadcast") {
    val p = plan("q_customer_by_region")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join:\n$p")
    assert(!p.contains("SortMergeJoin"), s"dimension join should not SMJ:\n$p")
  }

  test("top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q_top_parts")
    assert(p.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$p")
  }

  test("ANN query broadcasts the query side") {
    val p = plan("q_ann_topk")
    assert(p.contains("BroadcastNestedLoopJoin"), s"expected BNLJ:\n$p")
  }

  test("aggregations run partial+final hash aggregate") {
    val p = plan("q_event_type_stats")
    assert(p.contains("HashAggregate"), s"expected hash agg:\n$p")
  }

  test("whole-stage codegen covers the hot expressions") {
    // AQE plans only materialize stage-by-stage; execute first, then
    // inspect the final plan for codegen spans.
    val df = SparkEntry.queries("q_pricing_summary")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    // whole-stage-codegen stages print as "*(n) Operator" in this format
    assert(p.contains("*(1)"), s"expected codegen stages:\n$p")
  }
}
