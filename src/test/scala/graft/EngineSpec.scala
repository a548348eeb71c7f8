package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = GraftSession.builder("local[4]", "4")
      .appName("graft-test").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Contract-level smoke: every declared query runs and returns rows at
  * sf0.001, entry() is non-empty, names are unique, and each oracle key
  * has a query. Per-operator semantic specs live in the sibling *Spec
  * files.
  */
class EngineSpec extends AnyFunSuite {
  import TestSpark._

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("query/oracle maps are consistent") {
    val qs = SparkEntry.queries
    assert(qs.nonEmpty)
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs.keySet))
  }

  test("dashboard certification map points at registered queries") {
    val registered = SparkEntry.queries.keySet
    graft.queries.DashboardQueries.byReferenceName.foreach { case (ref, q) =>
      assert(registered.contains(q.name), s"$ref -> ${q.name} unregistered")
    }
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      // count() drives the whole plan; most queries should be non-empty
      // at sf0.001 but emptiness alone is not a failure for filters
      // that legitimately select nothing at tiny SF.
      df.count()
    }
  }
}
