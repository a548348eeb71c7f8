package graft

import java.nio.file.Files

import graft.ops.{DedupOps, RelevanceOps, SkewOps, TextOps}
import graft.sinks.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ST7 stage-chained pipeline: ingest → relevance → dedup → event
  * table (parquet handoffs between stages, like the reference's
  * file-chained 4-stage pipeline `run_chained_pipeline.py:61-180`) →
  * dashboard query on the final table. Plus matview refresh and
  * salted-join equivalence.
  */
class IntegrationSpec extends AnyFunSuite {
  import TestSpark._

  test("chained pipeline: relevance -> dedup -> partitioned table -> query") {
    val root = Files.createTempDirectory("chain").toString

    // stage 1: relevance enrichment, persisted (stage boundary)
    val ws = TextOps.words(col("text"))
    Tables.documents(spark, sf)
      .select(Seq(col("doc_id"), col("text"), col("lang")) ++
        RelevanceOps.analysisColumns(ws): _*)
      .write.mode("overwrite").parquet(s"$root/stage1")

    // stage 2: keep relevant, exact-dedup survivors
    val stage1 = spark.read.parquet(s"$root/stage1")
    val relevant = stage1.filter(col("is_relevant"))
    DedupOps.dedupRows(relevant, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/stage2")

    // stage 3: dashboard-style aggregate off the final table
    val fin = spark.read.parquet(s"$root/stage2")
    val dist = fin.groupBy(col("severity")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    assert(fin.count() > 0)
    assert(fin.count() <= relevant.count())
    assert(dist.keySet.subsetOf(Set("low", "medium", "high")))
    // relevance filter actually dropped something or kept all — either
    // way stage outputs must be consistent
    assert(relevant.count() ===
      stage1.filter(col("total_hits") > 0).count())
  }

  test("matview refresh reflects new data") {
    val path = Files.createTempDirectory("mv").toString + "/daily"
    val ev = Tables.events(spark, sf)
    Sinks.refreshDailySummary(ev.filter(col("event_type") =!= "error"), path)
    val before = spark.read.parquet(path)
      .agg(sum("n")).head.getLong(0)
    Sinks.refreshDailySummary(ev, path)
    val after = spark.read.parquet(path)
      .agg(sum("n")).head.getLong(0)
    assert(after === ev.count())
    assert(before < after)
  }

  test("salted join equals plain join") {
    val facts = Tables.events(spark, sf)
      .select(col("event_id"), col("event_type"))
    val dim = spark.createDataFrame(Seq(
      ("click", 1.0), ("purchase", 5.0), ("error", -1.0),
      ("view", 0.5), ("signup", 2.0))).toDF("event_type", "weight")
    val plain = facts.join(dim, "event_type")
      .agg(sum("weight")).head.getDouble(0)
    val salted = SkewOps.saltedJoin(facts, dim, Seq("event_type"), 8)
      .agg(sum("weight")).head.getDouble(0)
    assert(math.abs(plain - salted) < 1e-6)
    val n1 = facts.join(dim, "event_type").count()
    val n2 = SkewOps.saltedJoin(facts, dim, Seq("event_type"), 8).count()
    assert(n1 === n2)
  }

  test("two-phase count equals plain count") {
    val df = Tables.events(spark, sf)
    val plain = df.groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val two = SkewOps.twoPhaseCount(df, Seq("event_type"), 8)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(plain === two)
  }
}
