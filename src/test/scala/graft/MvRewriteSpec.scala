package graft

import graft.plans.MvRewrite
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The aggregate-over-MV rewrite's two obligations: it FIRES on the
  * registered pattern (plan scans the MV, not the base; answer
  * identical to the direct aggregate), and it REFUSES everything it
  * cannot prove (different grain, extra aggregates, filters,
  * DISTINCT) — a rewrite firing on an unproven pattern is a
  * wrong-answer bug, not a missed optimization.
  */
class MvRewriteSpec extends AnyFunSuite {
  import TestSpark._

  private val basePath = s"$sf/lineitem.parquet"

  private def userAgg = Tables.lineitem(spark, sf)
    .groupBy(col("l_returnflag"), col("l_linestatus"))
    .agg(sum("l_quantity").as("sum_qty"),
      sum("l_extendedprice").as("sum_price"),
      count(lit(1)).as("cnt"))

  private def withMv[A](f: String => A): A = {
    // other suites (EngineSpec running q_mv_rewrite) may have left a
    // registration for this dir — start from a clean slate
    MvRewrite.deregister(basePath)
    val mv = "graft_mv_spec_rollup"
    graft.sinks.Sinks.replaceTable(userAgg, mv)
    MvRewrite.register(basePath, MvRewrite.MvDef(
      mv, Seq("l_returnflag", "l_linestatus"),
      Map("l_quantity" -> "sum_qty", "l_extendedprice" -> "sum_price"),
      Some("cnt")))
    MvRewrite.install(spark)
    try f(mv) finally MvRewrite.deregister(basePath)
  }

  test("registered aggregate is answered from the MV, result-identical") {
    MvRewrite.deregister(basePath)
    val direct = userAgg.orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().toSeq
    withMv { mv =>
      val plan = userAgg.queryExecution.executedPlan.toString
      assert(plan.contains(mv),
        s"rewrite did not fire — no MV scan in:\n${plan.take(1500)}")
      assert(!plan.contains("lineitem.parquet"),
        s"base scan survived the rewrite:\n${plan.take(1500)}")
      val rewritten = userAgg.orderBy(col("l_returnflag"), col("l_linestatus"))
        .collect().toSeq
      assert(rewritten == direct,
        "MV-answered aggregate must be bit-identical to the direct one")
    }
  }

  test("unprovable shapes refuse to rewrite") {
    withMv { mv =>
      val cases = Seq(
        "coarser grain" -> Tables.lineitem(spark, sf)
          .groupBy(col("l_returnflag"))
          .agg(sum("l_quantity").as("sum_qty")),
        "unregistered aggregate (avg)" -> Tables.lineitem(spark, sf)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(avg("l_quantity").as("avg_qty")),
        "filter below the aggregate" -> Tables.lineitem(spark, sf)
          .filter(col("l_quantity") > 10)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum("l_quantity").as("sum_qty")),
        "distinct sum" -> Tables.lineitem(spark, sf)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(sum_distinct(col("l_quantity")).as("sum_qty")))
      cases.foreach { case (label, df) =>
        val plan = df.queryExecution.executedPlan.toString
        assert(!plan.contains(mv),
          s"$label must NOT rewrite:\n${plan.take(1200)}")
        assert(plan.contains("lineitem"),
          s"$label should still scan the base:\n${plan.take(1200)}")
      }
    }
  }

  test("deregistration restores the base scan") {
    withMv { _ => () } // registers then deregisters
    val plan = userAgg.queryExecution.executedPlan.toString
    assert(plan.contains("lineitem"),
      s"after deregister the base scan must return:\n${plan.take(1200)}")
  }
}
