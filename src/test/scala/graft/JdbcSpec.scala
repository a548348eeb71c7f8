package graft

import graft.sources.JdbcIO
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Real JDBC round-trip (S3/S4) against the embedded Derby shipped
  * with Spark: write a table, read it back plainly and partitioned,
  * and assert the filter is pushed into the database scan — the same
  * code runs against Postgres with a URL/driver swap.
  */
class JdbcSpec extends AnyFunSuite {
  import TestSpark._

  private val Url = "jdbc:derby:memory:graftdb;create=true"
  private val Driver = "org.apache.derby.iapi.jdbc.AutoloadedDriver"

  private lazy val src = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  test("JDBC write -> read round-trips rows") {
    JdbcIO.writeTable(src, Url, "events_jdbc", Driver)
    val back = JdbcIO.readTable(spark, Url, "events_jdbc", Driver)
    assert(back.count() === src.count())
    assert(back.agg(sum(col("user_id"))).head.getLong(0) ===
      src.agg(sum(col("user_id"))).head.getLong(0))
  }

  test("filters and projections push into the JDBC scan") {
    JdbcIO.writeTable(src, Url, "events_jdbc2", Driver,
      columnTypes = Some("event_type VARCHAR(32)"))
    val q = JdbcIO.readTable(spark, Url, "events_jdbc2", Driver)
      .filter(col("event_type") === "click" && col("value") > 100.0)
      .select(col("event_id"), col("value"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("EqualTo(event_type,click)")
        && plan.contains("GreaterThan(value,100.0)"),
      s"JDBC pushdown missing:\n$plan")
    val expected = src
      .filter(col("event_type") === "click" && col("value") > 100.0).count()
    assert(q.count() === expected)
  }

  test("partitioned JDBC read parallelizes and preserves results") {
    JdbcIO.writeTable(src, Url, "events_jdbc3", Driver)
    val maxId = src.agg(max(col("event_id"))).head.getLong(0)
    val part = JdbcIO.readTablePartitioned(
      spark, Url, "events_jdbc3", Driver, "event_id", 0L, maxId, 4)
    assert(part.rdd.getNumPartitions === 4)
    assert(part.count() === src.count())
  }
}
