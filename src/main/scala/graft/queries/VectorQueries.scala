package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.SimilarityOps
import org.apache.spark.sql.functions._

/** Similarity-search query surface over the `embeddings` table —
  * the engine's semantic-search/vector-store parity layer (J9/M8,
  * `chromadb_client.py:194-306`) plus embedding-cosine near-dedup
  * (A13, `deduplication_consumer.py:198-222`).
  *
  * The DuckDB oracles compute the identical double-precision
  * left-to-right dot products (`list_dot_product` over DOUBLE[]), so
  * similarity values compare bit-exactly after rounding.
  */
object VectorQueries {

  private val vd = "list_transform(embedding, x -> CAST(x AS DOUBLE))"

  /** Exact brute-force cosine top-k: the first 10 vectors are the query
    * batch, the rest the corpus; query side broadcast. */
  val q_ann_topk = QueryDef(
    "q_ann_topk",
    s"""WITH n AS (
       |  SELECT vec_id, vd, sqrt(list_dot_product(vd, vd)) AS nrm
       |  FROM (SELECT vec_id, $vd AS vd FROM embeddings)),
       |scored AS (
       |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
       |    list_dot_product(q.vd, c.vd) / (q.nrm * c.nrm) AS cos
       |  FROM n q JOIN n c ON q.vec_id < 10 AND c.vec_id >= 10)
       |SELECT query_id, rank, neighbor_id, ROUND(cos, 6) AS cos_sim FROM (
       |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY cos DESC, neighbor_id) AS rank
       |  FROM scored) t WHERE rank <= 5
       |ORDER BY query_id, rank""".stripMargin) { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    SimilarityOps.bruteForceTopK(
      emb.filter(col("vec_id") < 10),
      emb.filter(col("vec_id") >= 10),
      "vec_id", "embedding", 5)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs (threshold 0.4 — the
    * synthetic corpus has no planted vector dups; this surfaces the
    * most-similar tail deterministically). */
  val q_embed_neardup = QueryDef(
    "q_embed_neardup",
    s"""WITH n AS (
       |  SELECT vec_id, vd, sqrt(list_dot_product(vd, vd)) AS nrm
       |  FROM (SELECT vec_id, $vd AS vd FROM embeddings))
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  ROUND(list_dot_product(a.vd, b.vd) / (a.nrm * b.nrm), 6) AS cos_sim
       |FROM n a JOIN n b ON a.vec_id < b.vec_id
       |WHERE list_dot_product(a.vd, b.vd) / (a.nrm * b.nrm) >= 0.4
       |ORDER BY vec_a, vec_b""".stripMargin) { (spark, dir) =>
    SimilarityOps.cosineNearDupPairs(
      Tables.embeddings(spark, dir), "vec_id", "embedding", 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Label-centroid profile: per label, count + mean vector norm —
    * cluster-profile shape A11 (`spatial_clustering.py:380-462`) on the
    * vector table. */
  val q_label_profile = QueryDef(
    "q_label_profile",
    s"""SELECT label, COUNT(*) AS n,
       |  ROUND(AVG(sqrt(list_dot_product($vd, $vd))), 6) AS avg_norm
       |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (spark, dir) =>
    graft.functions.GraftFunctions.register(spark)
    Tables.embeddings(spark, dir)
      .withColumn("vd", col("embedding").cast("array<double>"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"),
        round(avg(sqrt(expr("dot_product(vd, vd)"))), 6).as("avg_norm"))
      .orderBy(col("label"))
  }

  /** LSH-bucketed near-dup variant — the 100 TB path (deterministic
    * hyperplane signatures). No SQL oracle: recall tradeoff is checked
    * against the brute-force result in the ScalaTest suite instead. */
  val q_embed_neardup_lsh = QueryDef.noOracle("q_embed_neardup_lsh") { (spark, dir) =>
    SimilarityOps.lshNearDupPairs(
      Tables.embeddings(spark, dir), "vec_id", "embedding",
      bands = 6, bandBits = 6, dim = 64, threshold = 0.4)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** IVF approximate top-k — the 100 TB ANN path (probe a few Voronoi
    * cells instead of the whole corpus). Rows-only; recall vs brute
    * force asserted in DedupOpsSpec. */
  val q_ann_ivf = QueryDef.noOracle("q_ann_ivf") { (spark, dir) =>
    val emb = Tables.embeddings(spark, dir)
    SimilarityOps.ivfTopK(
      emb.filter(col("vec_id") < 10),
      emb.filter(col("vec_id") >= 10),
      "vec_id", "embedding", k = 5, nCentroids = 16, nProbe = 4)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), col("cos_sim"))
      .orderBy(col("query_id"), col("rank"))
  }

  val all: Seq[QueryDef] = Seq(
    q_ann_topk, q_embed_neardup, q_label_profile, q_embed_neardup_lsh, q_ann_ivf)
}
