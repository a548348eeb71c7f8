package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC source/sink (SURVEY.md §2.1 S3/S4): the reference reads its
  * Postgres tables with per-consumer psycopg2 loops
  * (`psql_db_client.py`); the engine expresses the same access as
  * `spark.read.jdbc` so Catalyst pushes filters/projections into the
  * database and partitioned reads parallelize across executors.
  *
  * Exercised for real against the embedded Derby that ships with
  * Spark (JdbcSpec): round-trip write→read plus a plan assertion that
  * the predicate reaches the database (`PushedFilters` on the
  * JDBCRelation scan). A Postgres deployment is the same code with a
  * different URL/driver.
  */
object JdbcIO {

  def props(driver: String): Properties = {
    val p = new Properties()
    p.setProperty("driver", driver)
    p
  }

  /** Overwrite-write a DataFrame as a JDBC table. `columnTypes` maps
    * columns to explicit DDL types where the dialect default is wrong
    * for querying (e.g. Derby maps StringType to CLOB, which cannot be
    * compared — declare VARCHAR instead).
    */
  def writeTable(
      df: DataFrame, url: String, table: String, driver: String,
      columnTypes: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite")
    columnTypes.foreach(t => w.option("createTableColumnTypes", t))
    w.jdbc(url, table, props(driver))
  }

  /** Plain scan — Catalyst pushes projections and filters down. */
  def readTable(
      spark: SparkSession, url: String, table: String, driver: String): DataFrame =
    spark.read.jdbc(url, table, props(driver))

  /** Partitioned parallel scan: `numPartitions` range-partitioned
    * sub-queries on `partitionCol` — the shape a 1000-executor cluster
    * needs so one JDBC connection is not the bottleneck.
    */
  def readTablePartitioned(
      spark: SparkSession, url: String, table: String, driver: String,
      partitionCol: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions,
      props(driver))
}
