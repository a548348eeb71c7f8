package graft

import java.nio.file.Files

import graft.sinks.{KafkaIO, Sinks}
import graft.sources.JsonSources
import graft.streaming.StreamingOps
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the remaining operator-inventory surface: Kafka payload
  * shaping (S11), CSV sink (S8), session extensions, streaming
  * progress listener (ST8), latest-file selection (W6), SQL surface of
  * the native dot_product expression.
  */
class SurfaceSpec extends AnyFunSuite {
  import TestSpark._

  test("kafka payload uses key precedence and serializes whole record") {
    val payload = KafkaIO.toKafkaPayload(
      Tables.events(spark, sf).limit(5)).collect()
    payload.foreach { r =>
      assert(r.getString(0).nonEmpty) // event_id picked as key
      assert(r.getString(1).startsWith("{"))
      assert(r.getString(1).contains("\"event_type\""))
    }
  }

  test("csv sink writes header + all rows") {
    val out = Files.createTempDirectory("csv").toString
    val df = Tables.events(spark, sf).limit(20)
      .select(col("event_id"), col("event_type"), col("value"))
    Sinks.writeCsv(df, s"$out/report")
    val back = spark.read.option("header", "true").csv(s"$out/report")
    assert(back.count() === 20)
    assert(back.columns.toSeq === Seq("event_id", "event_type", "value"))
  }

  test("dot_product is callable from SQL after registration") {
    graft.functions.GraftFunctions.register(spark)
    val v = spark.sql("SELECT dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d")
      .head.getDouble(0)
    assert(v === 11.0)
  }

  test("extensions class injects without error") {
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
  }

  test("a session built with GraftExtensions resolves every native function from SQL") {
    // a sibling session over the same context, built the way a cluster
    // deploy would (--conf spark.sql.extensions=graft.GraftExtensions)
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .withExtensions(e => new GraftExtensions().apply(e))
      .getOrCreate()
    try {
      assert(s2.sql("SELECT dot_product(array(1.0D,2.0D), array(3.0D,4.0D))")
        .head().getDouble(0) === 11.0)
      assert(s2.sql("SELECT size(tokenize_ws('A b  C'))").head().getInt(0) === 3)
      assert(s2.sql("SELECT size(shingle_hashes('abcdef', 5))").head().getInt(0) === 2)
      assert(s2.sql("SELECT simhash_fp('a b', 40)").head().getLong(0) !== 0L)
      assert(s2.sql("SELECT byte_stats(cast('ab' as binary)).n_bytes")
        .head().getInt(0) === 2)
      assert(s2.sql("SELECT hyperplane_sig(array(1.0D, -1.0D), 8, 2)").count() === 1)
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark)
      org.apache.spark.sql.SparkSession.setActiveSession(spark)
    }
  }

  test("streaming progress listener observes all input rows") {
    val cap = new StreamingOps.ProgressCapture
    spark.streams.addListener(cap)
    try {
      SparkEntry.queries("q_stream_dedup")(spark, sf).count()
      // listener events are async; poll briefly
      val deadline = System.currentTimeMillis() + 10000
      while (cap.totalRows == 0 && System.currentTimeMillis() < deadline)
        Thread.sleep(100)
      assert(cap.totalRows >= Tables.documents(spark, sf).count())
    } finally spark.streams.removeListener(cap)
  }

  test("latest-file selection returns the newest file") {
    val d = Files.createTempDirectory("lf")
    Files.writeString(d.resolve("a.json"), "{}")
    Thread.sleep(1100) // fs mtime granularity
    Files.writeString(d.resolve("b.json"), "{}")
    val latest = JsonSources.latestFile(spark, d.toString)
    assert(latest.exists(_.endsWith("b.json")))
  }
}
