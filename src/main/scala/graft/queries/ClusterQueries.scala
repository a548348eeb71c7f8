package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.ClusterOps
import org.apache.spark.sql.functions._

/** Clustering query surface (M1/M2) over the first two embedding
  * dimensions as a 2-D point cloud. Algorithmic (iterative/seeded)
  * operators are not ANSI-SQL-expressible → rows-only driver checks;
  * DBSCAN is verified against an independent in-memory implementation
  * in ClusterOpsSpec.
  */
object ClusterQueries {

  private def points(spark: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.embeddings(spark, dir).select(
      col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))

  /** Grid-DBSCAN cluster profile (M1 + A11). */
  val q_dbscan_profile = QueryDef.noOracle("q_dbscan_profile") { (spark, dir) =>
    ClusterOps.clusterProfile(
      ClusterOps.dbscan(points(spark, dir), "vec_id", "x", "y",
        eps = 0.02, minPts = 4), "x", "y")
  }

  /** Seeded KMeans cluster sizes (M2). */
  val q_kmeans_sizes = QueryDef.noOracle("q_kmeans_sizes") { (spark, dir) =>
    ClusterOps.kmeans2d(points(spark, dir), "x", "y", k = 5, seed = 42L)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("cluster_id"))
  }

  val all: Seq[QueryDef] = Seq(q_dbscan_profile, q_kmeans_sizes)
}
