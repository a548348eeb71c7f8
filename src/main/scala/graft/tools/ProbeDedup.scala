package graft.tools

import graft.ops.{DedupOps, Reuse}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Large-N evidence for the LSH dedup wall (round-8 verdict item 4:
  * ProbeAsof proves the as-of exec at 20M rows; the MinHash-LSH family
  * had no equivalent). Synthetic corpus far beyond the sf0.1 documents
  * table (5k docs): groups of 4 documents share a base word sequence
  * with (id mod 4) positions perturbed — a planted near-dup ladder, so
  * candidate generation has real signal to find, plus hash-random
  * non-dup mass. One shared shingle table feeds every banding config;
  * per band count the probe measures the candidate-pair count, the
  * candidate-generation wall, and the exact-Jaccard verify wall — the
  * honest knee as rows-per-band shrinks (more bands of fewer rows =
  * higher recall = superlinearly more random-collision candidates).
  * Numbers land in PERF.md; re-runnable:
  * `runMain graft.tools.ProbeDedup [nDocs] [bandsCsv]`.
  */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val bandCounts = args.drop(1).headOption
      .map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(2, 4, 8))
    val spark = graft.GraftSession.local("32", "ERROR")
    import spark.implicits._
    spark.range(1000000).selectExpr("sum(id)").collect()

    // deterministic corpus: 10 words of <=5 base-36 chars; group base
    // g = id - id%4, document id perturbs its first (id%4) positions —
    // within a group, pairs differ in 0-3 of 10 words (a Jaccard
    // ladder through any useful threshold)
    val vocab = 60466176L // 36^5
    val wordCols = (1 to 10).map { j =>
      val g = col("id") - pmod(col("id"), lit(4L))
      val base = conv(pmod(g * 2654435761L + lit(j * 40503L), lit(vocab))
        .cast("string"), 10, 36)
      val pert = conv(pmod(col("id") * 40503L + lit(j * 2654435761L), lit(vocab))
        .cast("string"), 10, 36)
      when(pmod(col("id"), lit(4L)) >= j, pert).otherwise(base)
    }
    val docs = spark.range(nDocs)
      .select(col("id"), concat_ws(" ", wordCols: _*).as("text"))

    // the shingle table is shared across configs (the probe measures
    // the LSH stages, not re-shingling) — materialize once;
    // Reuse.materialized is EAGER, so the timing window wraps it
    val t0 = System.nanoTime()
    val sh = Reuse.materialized(
      DedupOps.discriminativeShingles(docs, "id", "text"))
    val nSh = sh.count()
    val tSh = (System.nanoTime() - t0) / 1e9
    println(f"dedup probe: nDocs=$nDocs shingles=$nSh shingleWall=$tSh%.2fs")

    val P = DedupOps.P
    def signature(k: Int): DataFrame = {
      val h = col("h") % P
      val aggs = (0 until k).map(i =>
        min((lit(DedupOps.hashA(i)) * h + lit(DedupOps.hashB(i))) % P).as(s"m$i"))
      sh.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    }

    for (bands <- bandCounts) {
      require(DedupOps.K % bands == 0, s"bands=$bands must divide K=${DedupOps.K}")
      val rpb = DedupOps.K / bands
      val sig = signature(DedupOps.K)
      val bandKeys = Seq("band") ++ (0 until rpb).map(r => s"b$r")
      val bandCols = (0 until bands).map { j =>
        val ms = (j * rpb until (j + 1) * rpb).zipWithIndex
          .map { case (i, r) => col(s"m$i").as(s"b$r") }
        struct((lit(j).as("band") +: ms): _*)
      }
      val buckets = sig
        .select(col("id"), explode(array(bandCols: _*)).as("bb"))
        .select((col("id") +: bandKeys.map(k => col(s"bb.$k"))): _*)
      val cand = buckets.as("x").join(buckets.as("y"),
          bandKeys.map(k => col(s"x.$k") === col(s"y.$k"))
            .reduce(_ && _) && col("x.id") < col("y.id"))
        .select(col("x.id").as("doc_a"), col("y.id").as("doc_b"))
        .distinct()
      val t1 = System.nanoTime()
      val candC = Reuse.materialized(cand) // eager — inside the window
      val nCand = candC.count()
      val tCand = (System.nanoTime() - t1) / 1e9

      // candidate-driven exact-Jaccard verify (the certified
      // minhashNearDuplicates tail): work is linear in candidates
      val t2 = System.nanoTime()
      val inter = candC
        .join(sh.select(col("id").as("doc_a"), col("h")), "doc_a")
        .join(sh.select(col("id").as("doc_b"), col("h")), Seq("doc_b", "h"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(count(lit(1)).as("inter"))
      val sz = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
      val nVerified = inter
        .join(sz.withColumnRenamed("id", "doc_a").withColumnRenamed("n", "na"), "doc_a")
        .join(sz.withColumnRenamed("id", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
        .filter(col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")) >= 0.5)
        .count()
      val tVer = (System.nanoTime() - t2) / 1e9
      println(f"dedup probe: nDocs=$nDocs bands=$bands rowsPerBand=$rpb " +
        f"candidates=$nCand candWall=$tCand%.2fs " +
        f"verified@0.5=$nVerified verifyWall=$tVer%.2fs")
    }
    spark.stop()
  }
}
