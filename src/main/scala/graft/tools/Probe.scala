package graft.tools

import graft.Tables
import graft.ops.DedupOps
import org.apache.spark.sql.SparkSession

/** Ad-hoc stage profiler for the dedup pipelines (not part of the
  * driver contract; run with `runMain graft.tools.Probe [sfDir]`).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("32")

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def reset(): Unit = graft.ops.Reuse.releaseAllCaches(spark)

    val docs = Tables.documents(spark, sfDir)
    t("docs.count")(docs.count())
    val sh = DedupOps.discriminativeShingles(docs, "doc_id", "text")
    t("discriminative.count")(sh.count())
    reset()
    t("minhash pass 1")(
      DedupOps.minhashNearDuplicates(docs, "doc_id", "text", 0.8).count())
    reset()
    t("minhash pass 2")(
      DedupOps.minhashNearDuplicates(docs, "doc_id", "text", 0.8).count())
    reset()
    t("dedupGroups")(
      DedupOps.dedupGroups(docs, "doc_id", "text", 0.8).count())
    reset()
    t("ngramJaccard")(
      DedupOps.ngramJaccardPairs(docs, "doc_id", "text", 0.5).count())
    spark.stop()
  }
}
