package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.DedupOps
import org.apache.spark.sql.functions._

/** Deduplication query surface over `documents` (SURVEY.md §2.4
  * A12-A15 and the training-data-pipeline dedup family). Semantics and
  * constants live in [[graft.ops.DedupOps]]; the oracle SQL is
  * generated from the same constants, so the DuckDB check covers the
  * full pipeline including LSH banding, not just the final filter.
  */
object DedupQueries {

  /** Tier-1 exact dedup by content hash: deterministic min-id winner +
    * duplicate count (`deduplication_consumer.py:138-166`). */
  val q_dedup_exact = QueryDef(
    "q_dedup_exact",
    """SELECT md5(text) AS content_hash, MIN(doc_id) AS keep_id,
      |  COUNT(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin) { (spark, dir) =>
    DedupOps.exactDedup(Tables.documents(spark, dir), "doc_id", "text")
      .select(col("content_hash"), col("keep_id"), col("n_copies"))
      .orderBy(col("keep_id"))
  }

  /** MinHash + LSH banded near-duplicate detection, exact-Jaccard
    * verified at threshold 0.8 (tier-2 fuzzy dedup analogue,
    * `deduplication_consumer.py:168-196`, threshold semantics `:252`).
    */
  val q_minhash_lsh = QueryDef(
    "q_minhash_lsh",
    DedupOps.minhashOracleSql(0.8)) { (spark, dir) =>
    DedupOps.minhashNearDuplicates(
      Tables.documents(spark, dir), "doc_id", "text", 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-duplicates at Hamming radius 2 with pigeonhole chunk
    * blocking (exact at this radius — no recall loss vs all-pairs). */
  val q_simhash = QueryDef(
    "q_simhash",
    DedupOps.simhashOracleSql(2)) { (spark, dir) =>
    DedupOps.simhashNearDuplicates(
      Tables.documents(spark, dir), "doc_id", "text", 2)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Direct n-gram Jaccard similarity pairs at threshold 0.8 via the
    * shingle inverted index with document-frequency capping (df <= 200):
    * ultra-common shingles contribute no discrimination but quadratic
    * join cost, so they are dropped from the index — the capped
    * semantics are replicated in the oracle. The planted near-dup pairs
    * share mostly rare shingles, so detection is unaffected.
    */
  val q_ngram_jaccard = QueryDef(
    "q_ngram_jaccard",
    DedupOps.ngramJaccardOracleSql(0.8)) { (spark, dir) =>
    DedupOps.ngramJaccardPairs(Tables.documents(spark, dir), "doc_id", "text", 0.8)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  val all: Seq[QueryDef] = Seq(
    q_dedup_exact, q_minhash_lsh, q_simhash, q_ngram_jaccard)
}
