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

  test("curation pipeline end-to-end: clean -> decontaminate -> sample -> pack") {
    import graft.ops.GraphOps
    val docs = Tables.documents(spark, sf)
    val n0 = docs.count()

    // 1. clean: quality gate + exact dedup winners + near-dup groups
    val quality = docs
      .withColumn("n_tokens", size(TextOps.words(col("text"))).cast("long"))
      .filter(col("n_tokens") >= 20)
    val exactKeep = DedupOps.exactDedup(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val groups = DedupOps.dedupGroups(docs, "doc_id", "text", 0.8)
    val canon = groups.filter(col("is_canonical")).select("doc_id")
    val clean = quality.join(exactKeep, "doc_id").join(canon, "doc_id")
    val n1 = clean.count()
    assert(n1 > 0 && n1 <= n0)

    // 2. decontaminate against the benchmark slice (doc_id < 5)
    val sh = DedupOps.shingleTable(clean, "doc_id", "text").localCheckpoint()
    val bench = DedupOps.shingleTable(docs.filter(col("doc_id") < 5), "doc_id", "text")
      .select("h").distinct()
    // threshold 0.9: the ~40-word synthetic vocab makes >20% raw
    // shingle overlap near-universal, so only near-verbatim overlap
    // counts as contamination at this corpus's statistics
    val contaminated = sh.join(broadcast(bench), "h")
      .groupBy(col("id")).agg(count(lit(1)).as("hits"))
      .join(sh.groupBy(col("id")).agg(count(lit(1)).as("tot")), "id")
      .filter(col("hits").cast("double") / col("tot") > 0.9)
      .select(col("id").as("doc_id"))
    val decon = clean.join(contaminated, Seq("doc_id"), "left_anti")
    val n2 = decon.count()
    assert(n2 > 0 && n2 <= n1)

    // 3. deterministic stratified sample (<= 10 per lang)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy((col("doc_id") % 1000003L * lit(2654435761L)) % 1000003L, col("doc_id"))
    val sampled = decon
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10).drop("rn")
    assert(sampled.groupBy(col("lang")).count()
      .agg(max(col("count"))).head.getLong(0) <= 10)

    // 4. pack into 1024-token bins per lang; every bin except the last
    // per stream holds >= the budget minus one doc's max length
    val packW = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(col("doc_id")).rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val bins = sampled
      .withColumn("cum", sum(col("n_tokens")).over(packW))
      .select(col("lang"),
        floor((col("cum") - col("n_tokens")) / lit(1024.0)).as("bin"),
        col("n_tokens"))
      .groupBy(col("lang"), col("bin"))
      .agg(sum(col("n_tokens")).as("bin_tokens"))
    assert(bins.count() > 0)
    val overfull = bins.filter(col("bin_tokens") >
      lit(1024) + sampled.agg(max(col("n_tokens"))).head.getLong(0)).count()
    assert(overfull === 0, "a pack bin exceeded budget + one max doc")

    // determinism: the whole chain reproduces itself
    val again = sampled.select("doc_id").collect().map(_.getLong(0)).sorted
    val first = sampled.select("doc_id").collect().map(_.getLong(0)).sorted
    assert(again.toSeq === first.toSeq)
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

  test("group-aware split is leakage-free where the per-doc split leaks") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // ids 1 and 3 share a text; the naive per-doc hash routes them to
    // buckets 9 (test) and 4 (train) — the eval-contamination bug the
    // group-aware split exists to prevent
    val docs = Seq(
      (1L, "the very same text"), (3L, "the very same text"),
      (4L, "something else"), (7L, "a third doc")
    ).toDF("doc_id", "text")
    def straddling(splitOf: org.apache.spark.sql.Column): Long =
      docs.select(
          min(col("doc_id")).over(Window.partitionBy(md5(col("text")))).as("rep"),
          splitOf.as("split"))
        .groupBy(col("rep")).agg(count_distinct(col("split")).as("ns"))
        .filter(col("ns") > 1).count()
    def bucketOf(key: org.apache.spark.sql.Column) =
      ((key % 1000003L) * 2654435761L) % 1000003L % 10
    assert(straddling(bucketOf(col("doc_id"))) === 1L) // naive: leaks
    val rep = min(col("doc_id")).over(Window.partitionBy(md5(col("text"))))
    assert(straddling(bucketOf(rep)) === 0L) // group-aware: never
    // and at the corpus SF the group split still straddles nothing
    val full = Tables.documents(spark, sf)
    val w = Window.partitionBy(md5(col("text")))
    val n = full.select(min(col("doc_id")).over(w).as("rep"),
        bucketOf(min(col("doc_id")).over(w)).as("b"))
      .groupBy(col("rep")).agg(count_distinct(col("b")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(n === 0L)
  }
}
