package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Columnar/semi-structured FORMAT round-trips beyond parquet — the
  * interchange surface a lake-scale pipeline needs when upstream teams
  * deliver ORC (the other columnar standard) or XML feeds (the classic
  * enterprise/clinical wire format — the reference's surveillance
  * domain, NYC DOHMH data drops, ships XML/CSV long before parquet).
  *
  * Certification strategy: each query WRITES the format copy from the
  * canonical parquet table, reads it back through Spark's native
  * format reader, and aggregates — certified against a DuckDB oracle
  * over the ORIGINAL parquet. A lossy encode, a mis-parsed timestamp,
  * or a broken pushdown all surface as a hash mismatch, so the round
  * trip itself is the thing under test, not just the aggregate.
  *
  * Scale posture: both writers/readers are ordinary distributed
  * FileFormat scans (splittable ORC stripes; one XML file per task) —
  * no driver-side staging. ORC scans take predicate pushdown and
  * column pruning exactly like parquet (asserted in FormatSpec).
  */
object FormatQueries {

  /** Scratch directory under the session warehouse — same lifecycle as
    * the managed index tables (overwritten per run, survives nothing).
    */
  private def scratch(spark: SparkSession, name: String): String =
    new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, name).toString

  /** T153 — ORC round-trip: lineitem projected to the five columns a
    * returns-analysis needs, written as ORC, read back with a shipdate
    * predicate (pushed into the ORC stripe index — FormatSpec asserts
    * `PushedFilters` on the scan), aggregated per return flag. The
    * oracle computes the same aggregate over the ORIGINAL parquet, so
    * any encode/decode loss in long/double/string/TIMESTAMP columns
    * breaks the hash. Money is summed in exact cents (house typing
    * rule: BIGINT outputs, never raw DOUBLE sums).
    */
  val q_orc_roundtrip = QueryDef(
    "q_orc_roundtrip",
    """SELECT l_returnflag,
      |  CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
      |  CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_price_cents,
      |  MAX(CAST(l_shipdate AS TIMESTAMP)) AS last_ship
      |FROM lineitem
      |WHERE CAST(l_shipdate AS TIMESTAMP) >= TIMESTAMP '1995-01-01'
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) {
    (spark, dir) =>
    val path = scratch(spark, "graft_fmt_lineitem_orc")
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
        col("l_returnflag"), col("l_shipdate"))
      .write.mode("overwrite").orc(path)
    spark.read.orc(path)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(round(col("l_extendedprice") * 100).cast("long"))
          .as("sum_price_cents"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy(col("l_returnflag"))
  }

  private val xmlEventSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts_iso", StringType),
    StructField("event_type", StringType),
    StructField("value_cents", LongType)))

  /** T154 — XML round-trip through Spark 4's built-in XML source
    * (`spark.read.format("xml")`, folded into core by SPARK-44265):
    * events serialized one `<event>` element per row (timestamps as
    * explicit-format ISO text, money as exact cents — XML is a text
    * format, so floats and implicit timestamp formats are where
    * round-trips rot), read back with an EXPLICIT schema (no
    * inference pass over 60k elements), re-parsed and aggregated per
    * type. Oracle reads the original parquet: a mis-escaped character,
    * dropped row, or timestamp format drift breaks the hash.
    */
  val q_xml_roundtrip = QueryDef(
    "q_xml_roundtrip",
    """SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
      |    AS sum_value_cents,
      |  MIN(CAST(ts AS TIMESTAMP)) AS first_ts,
      |  MAX(CAST(ts AS TIMESTAMP)) AS last_ts
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin) {
    (spark, dir) =>
    val path = scratch(spark, "graft_fmt_events_xml")
    val TsFmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    Tables.events(spark, dir)
      .select(col("event_id"),
        date_format(col("ts"), TsFmt).as("ts_iso"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents"))
      .write.mode("overwrite").format("xml")
      .option("rowTag", "event").option("rootTag", "events")
      .save(path)
    spark.read.format("xml")
      .option("rowTag", "event").schema(xmlEventSchema)
      .load(path)
      .select(col("event_type"),
        to_timestamp(col("ts_iso"), TsFmt).as("ts"), col("value_cents"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value_cents")).as("sum_value_cents"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
      .orderBy(col("event_type"))
  }

  val all: Seq[QueryDef] = Seq(q_orc_roundtrip, q_xml_roundtrip)
}
