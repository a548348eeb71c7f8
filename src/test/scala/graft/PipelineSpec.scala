package graft

import java.nio.file.Files

import graft.ops.MultimodalOps
import graft.sinks.Sinks
import graft.sources.JsonSources
import graft.streaming.StreamingOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end specs for the streaming / sink / source / multimodal
  * modules (the non-query surface of SURVEY.md §2.1, §2.9, §2.10).
  */
class PipelineSpec extends AnyFunSuite {
  import TestSpark._

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("streaming hourly agg equals batch hourly agg") {
    val streaming = SparkEntry.queries("q_stream_hourly")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = Tables.events(spark, sf)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
      .collect().map(_.toSeq).toSet
    assert(streaming === batch)
  }

  test("streaming stateful dedup emits one row per distinct hash") {
    val res = SparkEntry.queries("q_stream_dedup")(spark, sf).collect()
    val distinctHashes = Tables.documents(spark, sf)
      .select(md5(col("text"))).distinct().count()
    assert(res.length === distinctHashes)
    assert(res.map(_.getString(0)).distinct.length === res.length)
  }

  test("foreachBatch split sink writes both partitions") {
    val out = tmpDir("split")
    val schema = spark.read.parquet(s"$sf/events.parquet").schema
    val stream = StreamingOps.parquetStream(spark, s"$sf/events.parquet", schema)
    val q = StreamingOps.splitSinkQuery(
      stream, col("event_type") === "error",
      s"$out/accept", s"$out/reject", s"$out/ckpt")
    q.awaitTermination()
    val accept = spark.read.json(s"$out/accept")
    val reject = spark.read.json(s"$out/reject")
    val total = Tables.events(spark, sf).count()
    assert(accept.count() > 0)
    assert(accept.count() + reject.count() === total)
  }

  test("event table sink partitions by date and prunes") {
    val out = tmpDir("evtbl")
    Sinks.writeEventTable(Tables.events(spark, sf), s"$out/events")
    val back = spark.read.parquet(s"$out/events")
    assert(back.count() === Tables.events(spark, sf).count())
    val pruned = back.filter(col("event_date") === lit("2024-01-03").cast("date"))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(back.schema.fieldNames.contains("event_date"))
    assert(pruned.count() > 0)
    // partition filter must appear as a partition-level predicate, not
    // a data filter (pushed scan prunes directories)
    assert(plan.contains("PartitionFilters") || !plan.contains("Filter"))
  }

  test("upsertByKey keeps the latest version per key, updates win ties") {
    val spark0 = spark
    import spark0.implicits._
    val existing = Seq((1L, 1L, "old"), (2L, 5L, "keep")).toDF("id", "v", "payload")
    val updates = Seq((1L, 2L, "new"), (1L, 2L, "newer"), (3L, 1L, "ins"))
      .toDF("id", "v", "payload")
    val merged = Sinks.upsertByKey(existing, updates, Seq("id"), "v")
      .orderBy("id").collect()
    assert(merged.length === 3)
    assert(merged(0).getString(2).startsWith("new")) // update beat existing
    assert(merged(1).getString(2) === "keep")
    assert(merged(2).getString(2) === "ins")
  }

  test("appendNewIds is left-anti on existing ids") {
    val spark0 = spark
    import spark0.implicits._
    val existing = Seq(1L, 2L).toDF("id")
    val incoming = Seq((1L, "dup"), (3L, "new")).toDF("id", "text")
    val added = Sinks.appendNewIds(existing, incoming, "id").collect()
    assert(added.map(_.getLong(0)).toSeq === Seq(3L))
  }

  test("json dir reader handles array-JSON + JSONL and normalizes precedence") {
    val d = tmpDir("jsrc")
    Files.writeString(java.nio.file.Path.of(d, "a.json"),
      """[{"post_id":"p1","title":"t1","created_utc":"2024-01-01T00:00:00Z","score":5},
        | {"post_id":"p2","title":"t2","created_utc":"2024-01-02T00:00:00Z","score":6}]""".stripMargin)
    Files.writeString(java.nio.file.Path.of(d, "b.jsonl"),
      """{"id":"x1","text":"body1","timestamp":"2024-02-01T12:00:00Z"}
        |{"id":"x2","description":"body2","timestamp":"2024-02-02T12:00:00Z"}""".stripMargin)
    val raw = JsonSources.readJsonDir(spark, s"$d/a.json", s"$d/b.jsonl")
    assert(raw.count() === 4)
    val norm = JsonSources.normalize(raw).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(norm("p1") === "t1") // title used when text absent
    assert(norm("x1") === "body1") // text preferred
    assert(norm("x2") === "body2") // description fallback
  }

  test("multimodal feature extraction is deterministic with full schema") {
    val media = MultimodalOps.mediaFromDocuments(Tables.documents(spark, sf))
    val a = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    val b = MultimodalOps.extractFeatures(media).collect().sortBy(_.media_id)
    assert(a.toSeq === b.toSeq)
    assert(a.length === Tables.documents(spark, sf).count())
    a.foreach { f =>
      assert(f.n_bytes > 0)
      assert(f.mean_byte > 0)
      assert(Set("image", "audio", "video").contains(f.kind))
    }
  }

  test("frame sampling slices payloads deterministically") {
    val media = MultimodalOps.mediaFromDocuments(
      Tables.documents(spark, sf).limit(10))
    val frames = MultimodalOps.sampleFrames(media, frames = 8, stride = 2)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getLong(0))
    perDoc.values.foreach(g => assert(g.length <= 4)) // 8 frames stride 2
  }
}
