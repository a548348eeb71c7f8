package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Schema-on-read JSON ingestion (SURVEY.md §1.2, §2.1 S2).
  *
  * The reference's five copies of the directory reader accept both
  * array-JSON files and line-JSONL (`deduplication_consumer.py:
  * 362-408` et al.) and then duck-type fields by precedence lists.
  * Here: one reader handling both shapes via `multiLine` + JSONL
  * passes merged with `unionByName(allowMissingColumns)`, and the
  * precedence lists become `coalesce` projections — pure Catalyst,
  * fully prunable.
  */
object JsonSources {

  /** Field-precedence lists (`deduplication_consumer.py:123-136`,
    * `embedding_consumer.py:173-195`, `psql_db_client.py:290-306`).
    */
  val TextPrecedence: Seq[String] = Seq("text", "description", "title", "content", "body")
  val IdPrecedence: Seq[String] = Seq("post_id", "id", "unique_key", "complaint_number")
  val TsPrecedence: Seq[String] =
    Seq("created_at", "created_utc", "timestamp", "scraped_at", "processed_at")

  /** Read a directory containing array-JSON and/or JSONL files into one
    * DataFrame (schemas merged by name).
    */
  def readJsonDir(spark: SparkSession, arrayGlob: String, jsonlGlob: String): DataFrame = {
    val multi = spark.read.option("multiLine", "true").json(arrayGlob)
    val lines = spark.read.json(jsonlGlob)
    multi.unionByName(lines, allowMissingColumns = true)
  }

  /** Coalesce the first present column of `names` (missing columns are
    * treated as absent, not errors).
    */
  private def firstPresent(df: DataFrame, names: Seq[String]) = {
    val present = names.filter(df.columns.contains)
    if (present.isEmpty) lit(null).cast("string")
    else coalesce(present.map(c => col(c).cast("string")): _*)
  }

  /** Latest-file selection (W6, `app_upgraded.py:221-226`): newest
    * matching file by modification time.
    */
  def latestFile(spark: SparkSession, dir: String): Option[String] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) None
    else fs.listStatus(path).filter(_.isFile)
      .sortBy(s => (-s.getModificationTime, s.getPath.toString))
      .headOption.map(_.getPath.toString)
  }

  /** Normalize a raw source frame into the canonical record shape:
    * (record_id, text, event_ts, raw) — raw keeps the whole record as
    * JSON (`raw_data` parity, `psql_db_client.py:146`).
    */
  def normalize(df: DataFrame): DataFrame =
    df.select(
      firstPresent(df, IdPrecedence).as("record_id"),
      firstPresent(df, TextPrecedence).as("text"),
      to_timestamp(firstPresent(df, TsPrecedence)).as("event_ts"),
      to_json(struct(df.columns.map(col): _*)).as("raw"))
}
