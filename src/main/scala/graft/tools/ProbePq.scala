package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Ad-hoc: PQ recall@5 vs brute force across (M, K, iters) configs. */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = graft.GraftSession.local("8", "ERROR")
    val emb = graft.Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 10)
    val c = emb.filter(col("vec_id") >= 10)
    val brute = graft.ops.SimilarityOps.bruteForceTopK(q, c, "vec_id", "embedding", 5)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    for {
      (m, k, it) <- Seq((4, 8, 1), (4, 16, 2), (8, 16, 1), (8, 16, 2),
        (8, 32, 2), (16, 16, 2), (16, 32, 2))
    } {
      val t0 = System.nanoTime()
      val pq = graft.ops.SimilarityOps.pqTopK(q, c, "vec_id", "embedding", 5,
        subspaces = m, codebookSize = k, learnIters = it, dim = 64)
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      val recall = (pq intersect brute).size.toDouble / brute.size
      println(f"[pq] M=$m%-3d K=$k%-3d iters=$it  recall@5=$recall%.3f  " +
        f"${(System.nanoTime() - t0) / 1e9}%5.2f s")
    }
    spark.stop()
  }
}
