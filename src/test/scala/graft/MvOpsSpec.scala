package graft

import graft.ops.MvOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental-view invariant ([[MvOps]]): state built per batch
  * and monoid-merged must be indistinguishable from aggregating all
  * rows at once — for ANY split of the rows into batches, including
  * batches that introduce brand-new groups or touch only one group.
  */
class MvOpsSpec extends AnyFunSuite {
  import TestSpark._

  private def mk(rows: Seq[(String, Long)]) = {
    import spark.implicits._
    rows.toDF("g", "x")
  }

  private def norm(df: org.apache.spark.sql.DataFrame) =
    df.select("g", "mv_n", "mv_s", "mv_s2", "mv_mn", "mv_mx")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
      .sortBy(_._1).toSeq

  test("state merged across any batch split ≡ single-shot aggregation") {
    val rows = (0 until 300).map { i =>
      val h = i * 2654435761L
      (s"g${math.abs(h) % 5}", (h % 1000) - 137)
    }
    val full = norm(MvOps.aggState(mk(rows), Seq("g"), col("x")))
    // three different splits: round-robin, contiguous, one-sided
    // (the empty delta is the steady-state "no new data today" case)
    val splits = Seq(
      rows.zipWithIndex.partition(_._2 % 2 == 0),
      rows.zipWithIndex.partition(_._2 < 40),
      rows.zipWithIndex.partition(_ => true))
    for (((a, b), i) <- splits.zipWithIndex) {
      val merged = norm(MvOps.mergeStates(Seq("g"),
        MvOps.aggState(mk(a.map(_._1)), Seq("g"), col("x")),
        MvOps.aggState(mk(b.map(_._1)), Seq("g"), col("x"))))
      assert(merged === full, s"split #$i")
    }
    // three-way merge in two different orders — associativity in the
    // DataFrame composition, not just the abstract monoid
    val (p1, rest) = rows.splitAt(100)
    val (p2, p3) = rest.splitAt(100)
    val Seq(s1, s2, s3) =
      Seq(p1, p2, p3).map(p => MvOps.aggState(mk(p), Seq("g"), col("x")))
    assert(norm(MvOps.mergeStates(Seq("g"), s1, s2, s3)) === full)
    assert(norm(MvOps.mergeStates(Seq("g"),
      MvOps.mergeStates(Seq("g"), s3, s1), s2)) === full)
  }

  test("delta-only groups appear; untouched groups keep exact state") {
    val base = mk(Seq(("a", 10L), ("a", 20L), ("b", 5L)))
    val delta = mk(Seq(("a", 30L), ("c", 7L)))
    val merged = norm(MvOps.mergeStates(Seq("g"),
      MvOps.aggState(base, Seq("g"), col("x")),
      MvOps.aggState(delta, Seq("g"), col("x"))))
    assert(merged === Seq(
      ("a", 3L, 60L, 1400L, 10L, 30L),
      ("b", 1L, 5L, 25L, 5L, 5L),
      ("c", 1L, 7L, 49L, 7L, 7L)))
  }

  test("per-batch state writes are replay-idempotent and survive a checkpoint restart") {
    import java.nio.file.Files
    val stateDir = Files.createTempDirectory("mv_state_").toString
    val d1 = mk(Seq(("a", 10L), ("b", 5L)))
    val d2 = mk(Seq(("a", 20L), ("c", 7L)))
    MvOps.writeBatchState(d1, Seq("g"), col("x"), stateDir, 0L)
    MvOps.writeBatchState(d2, Seq("g"), col("x"), stateDir, 1L)
    val once = norm(MvOps.mergeStates(Seq("g"),
      MvOps.readStateLog(spark, stateDir)))
    // at-least-once replay: the SAME batch id re-runs after a crash
    // between sink write and checkpoint commit — must replace, not
    // double-count
    MvOps.writeBatchState(d2, Seq("g"), col("x"), stateDir, 1L)
    assert(norm(MvOps.mergeStates(Seq("g"),
      MvOps.readStateLog(spark, stateDir))) === once)
    assert(once === norm(
      MvOps.aggState(d1.unionByName(d2), Seq("g"), col("x"))))

    // checkpoint restart: drain two files, kill the query, add two
    // more, resume from the SAME checkpoint — the accumulated view
    // must equal the one-shot full aggregation (offset resume means
    // batch ids continue, never collide)
    val src = Files.createTempDirectory("mv_src_").toString
    val ck = Files.createTempDirectory("mv_ck_").toString
    val log = Files.createTempDirectory("mv_log_").toString
    def file(rows: Seq[(String, Long)]): Unit =
      mk(rows).coalesce(1).write.mode("append").parquet(src)
    def drain(): Unit = {
      val schema = spark.read.parquet(src).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
      val q = stream.writeStream
        .outputMode(org.apache.spark.sql.streaming.OutputMode.Append())
        .option("checkpointLocation", ck)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          MvOps.writeBatchState(b, Seq("g"), col("x"), log, id)
          ()
        }
        .start()
      try q.awaitTermination() finally q.stop()
    }
    val p1 = Seq(("a", 1L), ("b", 2L))
    val p2 = Seq(("a", 3L))
    val p3 = Seq(("c", 4L), ("a", 5L))
    val p4 = Seq(("b", 6L))
    file(p1); file(p2); drain()
    file(p3); file(p4); drain() // new query object, same checkpoint
    val restarted = norm(MvOps.mergeStates(Seq("g"),
      MvOps.readStateLog(spark, log)))
    assert(restarted === norm(MvOps.aggState(
      mk(p1 ++ p2 ++ p3 ++ p4), Seq("g"), col("x"))))
  }

  test("finalizeState derives exact mean and population variance from moments") {
    val df = mk(Seq(("a", 2L), ("a", 4L), ("a", 9L)))
    val out = MvOps.finalizeState(MvOps.aggState(df, Seq("g"), col("x")))
      .select("mv_avg", "mv_var").collect()(0)
    assert(out.getDouble(0) === 5.0)
    // var = E[x²] − E[x]² = (4+16+81)/3 − 25
    assert(math.abs(out.getDouble(1) - (101.0 / 3 - 25.0)) < 1e-12)
  }

  test("nullable measures: mv_n counts present values, so derived stats stay exact") {
    import spark.implicits._
    // regression: count(lit(1)) would report n=3 for group a and make
    // mean/variance wrong for any nullable measure; the state must
    // describe the PRESENT values only
    val df = Seq(("a", Some(10L)), ("a", None), ("a", Some(20L)),
      ("b", Option.empty[Long])).toDF("g", "x")
    val out = MvOps.finalizeState(MvOps.aggState(df, Seq("g"), col("x")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(out("a")._1 === 2L)
    assert(out("a")._2 === Some(15.0))
    // an all-null group carries empty state (n = 0, null stats)
    assert(out("b")._1 === 0L && out("b")._2.isEmpty)
  }
}
