package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures what the PCA basis BUYS for truncated similarity search:
  * recall@10 (vs full-64-dim cosine ground truth) of brute search over
  * m-dim vectors produced by (a) the deflated-power-iteration PCA
  * transform and (b) naive first-m-dims truncation, at matched m and
  * identical query/corpus split — the evidence row behind
  * q_pca_transform's "energy-compacting basis" claim in PERF.md.
  *
  * Usage: runMain graft.tools.ProbePca [sfDir]
  */
object ProbePca {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("32", "ERROR")
    graft.functions.GraftFunctions.register(spark)
    val emb = graft.Tables.embeddings(spark, sfDir)

    def topk(df: DataFrame, vecCol: String, k: Int): DataFrame =
      graft.ops.SimilarityOps.bruteForceTopK(
        df.filter(col("vec_id") < 50),
        df.filter(col("vec_id") >= 50),
        "vec_id", vecCol, k)
        .select(col("query_id"), col("neighbor_id"))

    def recallVs(truth: DataFrame, got: DataFrame): Double = {
      val hit = truth.join(got, Seq("query_id", "neighbor_id")).count()
      hit.toDouble / truth.count()
    }

    val truth = topk(emb, "embedding", 10).cache()
    truth.count()

    def section(tag: String, corpus: DataFrame): Unit = {
      val gt = topk(corpus, "embedding", 10).cache()
      gt.count()
      for (m <- Seq(4, 8, 16)) {
        val t0 = System.nanoTime()
        val pca = graft.ops.PcaOps.transform(
          corpus, "vec_id", "embedding", dim = 64, iters = 6, m = m)
          .select(col("vec_id"),
            array((1 to m).map(t => col(s"pc$t")): _*).as("pvec"))
        val fitS = (System.nanoTime() - t0) / 1e9
        val rPca = recallVs(gt, topk(pca, "pvec", 10))
        val naive = corpus.select(col("vec_id"),
          slice(col("embedding"), 1, m).as("nvec"))
        val rNaive = recallVs(gt, topk(naive, "nvec", 10))
        println(f"[$tag] m=$m%2d  recall@10 pca=$rPca%.3f naive=$rNaive%.3f  (basis fit $fitS%.1f s)")
      }
      gt.unpersist()
    }

    section("sf-corpus", emb)

    // Planted rank-8 corpus: signal lives in 8 random directions mixed
    // across ALL 64 coordinates (+5% isotropic noise), so naive first-m
    // coordinate truncation sees only a shadow of it while the fitted
    // basis recovers the signal subspace.
    val rnd = new scala.util.Random(42)
    val basis = Array.fill(8, 64)(rnd.nextGaussian())
    val planted = {
      import spark.implicits._
      (0 until 2050).map { i =>
        val gs = Array.fill(8)(rnd.nextGaussian())
        val v = Array.tabulate(64) { j =>
          ((0 until 8).map(t => gs(t) * basis(t)(j)).sum
            + 0.05 * rnd.nextGaussian()).toFloat
        }
        (i.toLong, v)
      }.toDF("vec_id", "embedding")
    }
    section("rank-8 planted", planted)
    spark.stop()
  }
}
