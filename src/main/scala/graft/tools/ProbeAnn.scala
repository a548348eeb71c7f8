package graft.tools

import graft.Tables
import graft.ops.SimilarityOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN quality/cost frontier: recall@k vs [[SimilarityOps.bruteForceTopK]]
  * and wall time for each approximate path (IVF with its nProbe sweep,
  * PQ-ADC, hyperplane-LSH bucketing) under Bench-identical conditions.
  * Emits the markdown table committed to PERF.md (provenance: this
  * tool, re-runnable with `runMain graft.tools.ProbeAnn [sfDir]`).
  */
object ProbeAnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("32", "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    val k = 10
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 50)
    val corpus = emb.filter(col("vec_id") >= 50)
    val nQ = queries.count()

    def run(name: String, f: () => DataFrame): (String, Double, Set[(Long, Long)]) = {
      // warm once (centroid learning JIT etc.), then time
      f().count()
      val t0 = System.nanoTime()
      val pairs = f().select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.Reuse.releaseAllCaches(spark)
      (name, dt, pairs)
    }

    val (_, tBrute, truth) = run("brute", () =>
      SimilarityOps.bruteForceTopK(queries, corpus, "vec_id", "embedding", k))

    val rows = Seq(
      ("exact brute-force (baseline)", tBrute, 1.0) +: (
        Seq(1, 2, 4, 8).map { nProbe =>
          val (_, t, got) = run(s"ivf p$nProbe", () =>
            SimilarityOps.ivfTopK(queries, corpus, "vec_id", "embedding", k,
              nCentroids = 16, nProbe = nProbe, learnIters = 2))
          (s"IVF 16 cells, Lloyd's x2, nProbe=$nProbe", t,
            (got & truth).size.toDouble / (nQ * k))
        } ++ Seq({
          val (_, t, got) = run("pq", () =>
            SimilarityOps.pqTopK(queries, corpus, "vec_id", "embedding", k,
              subspaces = 8, codebookSize = 16, learnIters = 1, dim = 64))
          ("PQ-ADC M=8 K=16 (8x compression)", t,
            (got & truth).size.toDouble / (nQ * k))
        }) ++ Seq((4, 4), (8, 4), (8, 6)).map { case (bands, bits) =>
          val (_, t, got) = run(s"lsh $bands x$bits", () =>
            SimilarityOps.lshTopK(queries, corpus, "vec_id", "embedding", k,
              bands = bands, bandBits = bits, dim = 64))
          (s"LSH $bands bands x $bits bits", t,
            (got & truth).size.toDouble / (nQ * k))
        }): _*)

    println(s"| ANN path | wall (s) | recall@$k |")
    println("|---|---|---|")
    rows.foreach { case (name, t, r) =>
      println(f"| $name | $t%.2f | $r%.3f |")
    }
    spark.stop()
  }
}
