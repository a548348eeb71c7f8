package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-layout posture: bucketed tables co-locate join keys at
  * WRITE time, so the join itself runs with ZERO shuffle exchanges —
  * on a 1000-executor cluster this is the difference between
  * re-shuffling 100 TB per join and reading pre-placed buckets. The
  * fact table at scale would be written `bucketBy(N, key)` once and
  * joined many times; this spec proves the engine's plans actually
  * exploit that layout (bucket metadata → no Exchange, result
  * identical to the shuffled join).
  */
class StorageSpec extends AnyFunSuite {
  import TestSpark._

  test("bucketed-by-key tables sort-merge join with zero exchanges") {
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    spark.sql("DROP TABLE IF EXISTS g_orders_b")
    spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    o.write.mode("overwrite")
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("g_orders_b")
    li.write.mode("overwrite")
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("g_lineitem_b")

    val broadcastThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force the shuffle-join path so the assertion is about bucket
      // layout, not about broadcast kicking in at toy scale
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("g_lineitem_b")
        .join(spark.table("g_orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      // the ONLY exchange allowed is the one for the final groupBy on a
      // different key; the join itself must read buckets directly
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"join shuffled despite bucket co-location:\n${joinSection.take(800)}")

      val expected = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority").collect().toSeq
      assert(joined.orderBy("o_orderpriority").collect().toSeq === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.sql("DROP TABLE IF EXISTS g_orders_b")
      spark.sql("DROP TABLE IF EXISTS g_lineitem_b")
    }
  }

  test("ORC round-trips losslessly and pushes filters into the scan") {
    // second columnar format (built-in ORC reader/writer): a warehouse
    // swap-in for parquet with the same pushdown posture
    val docs = Tables.documents(spark, sf)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_orc_").toString + "/docs_orc"
    docs.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    // lossless round-trip: same schema, same multiset of rows
    assert(back.schema === docs.schema)
    val fp = (df: org.apache.spark.sql.DataFrame) => df
      .agg(count(lit(1)), sum(col("doc_id")), sum(length(col("text"))))
      .collect().head.toSeq
    assert(fp(back) === fp(docs))
    // predicate + projection reach the ORC scan
    val q = back.filter(col("n_chars") > 500).select("doc_id", "n_chars")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,500)]"),
      scan.take(600))
    assert(q.count() ===
      docs.filter(col("n_chars") > 500).count())
  }

  test("sketch-index delta append keeps the bucket layout and full-build equivalence") {
    // q_ann_index_delta builds 90% + appends 10%; its result must be
    // indistinguishable from the full-corpus sketch search, and the
    // catalog must still report the bucket spec after the append (an
    // append that silently drops bucketing would rot the layout
    // contract one ingest batch at a time)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val viaDelta = norm(graft.queries.VectorQueries.q_ann_index_delta.fn(spark, sf))
    val viaFull = norm(graft.queries.VectorQueries.q_ann_sketch.fn(spark, sf))
    assert(viaDelta === viaFull)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier("graft_ann_index_delta"))
    assert(meta.bucketSpec.exists(b =>
      b.numBuckets === 8 && b.bucketColumnNames === Seq("neighbor_id")),
      s"bucket spec lost on append: ${meta.bucketSpec}")
  }

  test("small-file compaction preserves every row and hits the size-derived file count") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val docs = Tables.documents(spark, sf)
    // simulate an append-heavy layout: 64 files for a tiny table
    docs.repartition(64).write.mode("overwrite").parquet(s"$dir/frag")
    def parquetFiles(p: String) =
      new java.io.File(p).listFiles.count(f => f.getName.endsWith(".parquet"))
    val fragFiles = parquetFiles(s"$dir/frag")
    assert(fragFiles >= 32, s"fragmentation setup produced $fragFiles files")
    val fragBytes = new java.io.File(s"$dir/frag").listFiles
      .filter(_.getName.endsWith(".parquet")).map(_.length).sum
    val target = fragBytes / 3 // aim for ~3-4 compacted files
    graft.sinks.Sinks.compactParquet(spark, s"$dir/frag", s"$dir/compact", target)
    val compFiles = parquetFiles(s"$dir/compact")
    val wantFiles = math.ceil(fragBytes.toDouble / target).toInt
    assert(compFiles === wantFiles, s"expected $wantFiles files, got $compFiles")
    assert(compFiles < fragFiles / 4)
    // no row lost, no row mutated (order-free checksum over doc ids +
    // text lengths)
    def sig(p: String) = spark.read.parquet(p)
      .agg(sum(col("doc_id") * 31 + length(col("text"))), count(lit(1)))
      .collect().head
    assert(sig(s"$dir/compact") === sig(s"$dir/frag"))
  }

  test("native as-of join runs EXCHANGE-FREE over key-bucketed tables") {
    // the feature-store layout: history and probe batches both
    // bucketed by the join key. AsofJoinExec declares
    // ClusteredDistribution on the keys, so two co-bucketed scans
    // satisfy it directly — at 100 TB this removes the history-side
    // shuffle entirely (only per-partition sorts remain, which spill)
    val ev = Tables.events(spark, sf)
      .withColumn("us", unix_micros(col("ts")))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("us").as("purchase_us"))
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("us").as("click_us"))
      .agg(max(col("event_id")).as("click_id"))
    for (t <- Seq("g_asof_left_b", "g_asof_right_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    purchases.write.bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("g_asof_left_b")
    clicks.write.bucketBy(8, "user_id").sortBy("user_id")
      .saveAsTable("g_asof_right_b")
    val joined = graft.ops.JoinOps.asofJoinNative(
      spark.table("g_asof_left_b"), spark.table("g_asof_right_b"),
      keyCol = "user_id", leftTsCol = "purchase_us", rightTsCol = "click_us",
      rightValCols = Seq("click_us", "click_id"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan.take(1000))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed as-of should not shuffle:\n${plan.take(1500)}")
    // and the exchange-free plan returns the same rows as the
    // shuffled one over the raw frames
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val viaRaw = norm(graft.ops.JoinOps.asofJoinNative(
      purchases, clicks,
      keyCol = "user_id", leftTsCol = "purchase_us", rightTsCol = "click_us",
      rightValCols = Seq("click_us", "click_id"))
      .select("purchase_id", "user_id", "purchase_us", "click_us", "click_id"))
    assert(norm(joined.select("purchase_id", "user_id", "purchase_us",
      "click_us", "click_id")) === viaRaw)
  }
}
