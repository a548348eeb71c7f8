package graft.tools

import graft.Tables
import graft.ops.ClusterOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B: dbscan profile with the shared kernel (eager persist) — run
  * twice to see warm-state cost (ad-hoc, not part of driver contract).
  */
object ProbeDbscan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("32")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def reset(): Unit = graft.ops.Reuse.releaseAllCaches(spark)
    val pts = Tables.embeddings(spark, sfDir).select(
      col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
    t("pts.count")(pts.count())
    for (i <- 1 to 3) {
      reset()
      t(s"dbscan profile #$i")(
        ClusterOps.clusterProfile(
          ClusterOps.dbscan(pts, "vec_id", "x", "y", 0.02, 4), "x", "y").count())
    }
    spark.stop()
  }
}
