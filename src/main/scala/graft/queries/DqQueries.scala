package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suite — the dbt-test / Great-Expectations
  * surface as ONE engine query: each check is a single-pass aggregate
  * that reports violations and population, union'd into a compact
  * audit report. The reference validates ingest row-by-row in Python
  * (`kafka_publisher.py` field precedence, `psql_db_client.py` insert
  * guards); here the same contracts run as declarative scans.
  *
  * Every check is violations-counting, never row-returning, so the
  * report is O(#checks) rows at any table size; the only join is the
  * referential-integrity probe, which at 100 TB is the dimension-
  * broadcast shape (the key set of the referenced dimension is the
  * small side).
  */
object DqQueries {

  private def check(name: String, table: String, df: DataFrame,
      violation: Column): DataFrame =
    df.agg(
      sum(when(violation, 1L).otherwise(0L)).as("n_violations"),
      count(lit(1)).as("n_checked"))
      .select(lit(name).as("check_name"), lit(table).as("table_name"),
        col("n_violations"), col("n_checked"))

  /** Six contract checks over four tables; `n_violations` must be 0 on
    * healthy testdata, and the oracle recomputes each check in SQL so
    * a broken check (not just broken data) also fails certification.
    */
  val q_dq_checks = QueryDef(
    "q_dq_checks",
    """SELECT 'doc_nchars_mismatch' AS check_name, 'documents' AS table_name,
      |  CAST(SUM(CASE WHEN text IS NULL OR n_chars <> length(text)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  CAST(COUNT(*) AS BIGINT) AS n_checked
      |FROM documents
      |UNION ALL
      |SELECT 'dup_custkey', 'customer',
      |  CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT),
      |  CAST(SUM(c) AS BIGINT)
      |FROM (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey) t
      |UNION ALL
      |SELECT 'lineitem_range', 'lineitem',
      |  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
      |    OR l_discount < 0 OR l_discount > CAST(0.1 AS DOUBLE)
      |    OR l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'nonpositive_order_price', 'orders',
      |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'null_event_fields', 'events',
      |  CAST(SUM(CASE WHEN value IS NULL OR user_id IS NULL OR ts IS NULL
      |    OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM events
      |UNION ALL
      |SELECT 'orphan_order_custkey', 'orders',
      |  CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |  ON o.o_custkey = c.c_custkey
      |ORDER BY check_name""".stripMargin) { (spark, dir) =>
    val docs = check("doc_nchars_mismatch", "documents",
      Tables.documents(spark, dir),
      col("text").isNull || col("n_chars") =!= length(col("text")))
    val custDups = Tables.customer(spark, dir)
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
          .as("n_violations"),
        sum(col("c")).as("n_checked"))
      .select(lit("dup_custkey").as("check_name"),
        lit("customer").as("table_name"), col("n_violations"),
        col("n_checked"))
    val li = check("lineitem_range", "lineitem",
      Tables.lineitem(spark, dir),
      col("l_quantity") < 1 || col("l_quantity") > 50 ||
        col("l_discount") < 0 || col("l_discount") > 0.1 ||
        col("l_tax") < 0)
    val price = check("nonpositive_order_price", "orders",
      Tables.orders(spark, dir), col("o_totalprice") <= 0)
    val ev = check("null_event_fields", "events",
      Tables.events(spark, dir),
      col("value").isNull || col("user_id").isNull || col("ts").isNull ||
        col("event_type").isNull)
    val custKeys = Tables.customer(spark, dir)
      .select(col("c_custkey")).distinct()
    val orphans = check("orphan_order_custkey", "orders",
      Tables.orders(spark, dir)
        .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"),
          "left"),
      col("c_custkey").isNull)
    docs.unionByName(custDups).unionByName(li).unionByName(price)
      .unionByName(ev).unionByName(orphans)
      .orderBy(col("check_name"))
  }

  /** k-anonymity audit over the quasi-identifier (event_type, day,
    * value tier): per type, how many equivalence classes fall below
    * k=5 and how many rows they hold — the privacy gate run before a
    * dataset release (suppress or generalize those rows). One
    * grouping pass + one rollup; class counts are exact integers.
    */
  val q_k_anonymity = QueryDef(
    "q_k_anonymity",
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(FLOOR(value / 50) AS BIGINT) AS value_tier,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(5 AS BIGINT) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS small_classes,
      |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |    AS rows_to_suppress,
      |  CAST(MIN(n) AS BIGINT) AS min_class_size
      |FROM q GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"),
        floor(col("value") / 50).cast("long").as("value_tier"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("small_classes"),
        sum(when(col("n") < 5, col("n")).otherwise(0L))
          .as("rows_to_suppress"),
        min(col("n")).as("min_class_size"))
      .select(col("event_type"), lit(5L).as("k"), col("n_classes"),
        col("small_classes"), col("rows_to_suppress"),
        col("min_class_size"))
      .orderBy(col("event_type"))
  }

  val all: Seq[QueryDef] = Seq(q_dq_checks, q_k_anonymity)
}
