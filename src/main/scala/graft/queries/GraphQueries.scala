package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{DedupOps, GraphOps}
import org.apache.spark.sql.functions._

/** Whole-graph analytics over the near-duplicate similarity graph —
  * the iterative-algorithm family (beyond connected components) that a
  * 100 TB curation pipeline runs on its candidate-pair output:
  * centrality tells you which documents sit at the center of large
  * duplication clusters (crawl hubs, boilerplate templates).
  */
object GraphQueries {

  private val Iterations = 10

  /** Deterministic PageRank ([[GraphOps.pageRank]]) on the symmetric
    * MinHash near-dup graph (threshold 0.8) over ALL documents —
    * dangling (unduplicated) docs keep the teleport+dangling-share
    * mass; hub docs of chained duplicate clusters rank highest. The
    * oracle replays all `Iterations` rounds as unrolled CTEs in exact
    * integer micro-unit arithmetic on top of the certified MinHash
    * pair CTEs — bit-equality across engines, no float in sight.
    */
  val q_pagerank = QueryDef(
    "q_pagerank", {
      // AS MATERIALIZED: each iteration references its predecessor
      // more than once (dangling mass + contributions) — DuckDB's
      // default CTE inlining would otherwise expand the chain
      // exponentially (2^Iterations copies of the MinHash pipeline).
      val iters = (0 until Iterations).map { t =>
        s"""d$t AS MATERIALIZED (
           |  SELECT COALESCE(CAST(SUM(r.rank) AS BIGINT), 0) AS dm
           |  FROM r$t r LEFT JOIN deg g ON g.id = r.id WHERE g.id IS NULL),
           |c$t AS MATERIALIZED (
           |  SELECT e.dst AS id, CAST(SUM(r.rank // g.outdeg) AS BIGINT) AS s
           |  FROM r$t r JOIN deg g ON g.id = r.id JOIN edges e ON e.src = r.id
           |  GROUP BY e.dst),
           |r${t + 1} AS MATERIALIZED (
           |  SELECT n.id, CAST(((sc.s // sc.n) * 15) // 100
           |    + (85 * (COALESCE(c.s, 0) + d.dm // sc.n)) // 100 AS BIGINT) AS rank
           |  FROM nodes n CROSS JOIN sc CROSS JOIN d$t d
           |  LEFT JOIN c$t c ON c.id = n.id)""".stripMargin
      }.mkString(",\n")
      s"""WITH ${DedupOps.minhashPairsSqlCtes(0.8)},
         |edges AS MATERIALIZED (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS MATERIALIZED (SELECT doc_id AS id FROM documents),
         |sc AS MATERIALIZED (
         |  SELECT GREATEST(1000000, 1000 * COUNT(*)) AS s, COUNT(*) AS n
         |  FROM nodes),
         |deg AS MATERIALIZED (
         |  SELECT src AS id, COUNT(*) AS outdeg FROM edges GROUP BY src),
         |r0 AS MATERIALIZED (
         |  SELECT n.id, CAST(sc.s // sc.n AS BIGINT) AS rank
         |  FROM nodes n CROSS JOIN sc),
         |$iters
         |SELECT r.id AS doc_id, r.rank AS rank_micro
         |FROM r$Iterations r ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val pairs = graft.ops.Reuse.materialized(
      DedupOps.minhashNearDuplicates(docs, "doc_id", "text", 0.8)
        .select(col("doc_a"), col("doc_b")))
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    val nodes = docs.select(col("doc_id").as("id"))
    GraphOps.pageRank(nodes, edges, Iterations)
      .select(col("id").as("doc_id"), col("rank").as("rank_micro"))
      .orderBy(col("doc_id"))
  }

  val all: Seq[QueryDef] = Seq(q_pagerank)
}
