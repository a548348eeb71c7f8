package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All engine queries read through here so that scan-level concerns
  * (nanosecond-timestamp normalization, future partition layouts) live
  * in one place. Filters/projections applied by callers are pushed into
  * the parquet scan by Catalyst — at 100 TB the event/lineitem tables
  * would additionally be laid out partitioned-by-date so the same
  * predicates prune partitions.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** `events.parquet` has carried several physical timestamp encodings
    * across testdata generations: INT64 TIMESTAMP(NANOS) (unsupported by
    * the vectorized reader — read as long and rescale), INT64
    * TIMESTAMP_MICROS with isAdjustedToUTC=0 (read as TIMESTAMP_NTZ —
    * cast to session-zone timestamp, with the session zone pinned to UTC
    * so the wall-clock is preserved exactly), and plain TIMESTAMP.
    * Normalize all of them here so every downstream query sees a plain
    * `timestamp` column `ts`.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case "timestamp_ntz" => raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
}
