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

  /** Asymmetric containment near-dup: the partial-duplication detector
    * (doc embedded in a longer doc) that symmetric Jaccard misses. */
  val q_containment_pairs = QueryDef(
    "q_containment_pairs",
    DedupOps.containmentOracleSql(0.9)) { (spark, dir) =>
    DedupOps.containmentPairs(Tables.documents(spark, dir), "doc_id", "text", 0.9)
      .orderBy(col("contained_doc"), col("container_doc"))
  }

  /** MinHash signature-accuracy audit over the LSH candidates:
    * estimated (component-agreement) vs exact Jaccard with absolute
    * error — the measurement K/banding are tuned against, since at
    * scale the estimator replaces exact verification. */
  val q_minhash_est = QueryDef(
    "q_minhash_est",
    DedupOps.minhashEstimateOracleSql) { (spark, dir) =>
    DedupOps.minhashEstimatePairs(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Delimiter-free line-level (10-word-segment) dedup: cross-doc
    * duplicated segments kept only in the lowest-id doc; per-doc kept
    * counts + cleaned-text md5. */
  val q_segment_dedup = QueryDef(
    "q_segment_dedup",
    DedupOps.segmentDedupOracleSql) { (spark, dir) =>
    DedupOps.segmentDedup(Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
  }

  /** Incremental dedup — a "new batch" (every 5th doc) checked against
    * the index corpus (the rest): asymmetric band-bucket candidates
    * (never new×new or index×index), index-defined df-cap, best index
    * match per new doc. The production daily-crawl shape. */
  val q_incremental_dedup = QueryDef(
    "q_incremental_dedup",
    DedupOps.incrementalOracleSql("doc_id % 5 = 4", 0.8)) { (spark, dir) =>
    DedupOps.incrementalNearDuplicates(
      Tables.documents(spark, dir), "doc_id", "text",
      isNew = col("doc_id") % 5 === 4, threshold = 0.8)
      .orderBy(col("new_id"))
  }

  /** End-to-end training-corpus cleaning: quality gate (>= 20 tokens)
    * → exact dedup (min-id winner per content hash) → near-duplicate
    * removal (MinHash-LSH pairs at 0.8; the higher id of each pair
    * loses). The full pipeline has one oracle composed from the same
    * generated CTEs, so the driver verifies the composition, not just
    * the stages.
    */
  val q_clean_corpus = QueryDef(
    "q_clean_corpus", {
      val ws = graft.ops.TextOps.wordsSql("text")
      s"""WITH ${DedupOps.minhashPairsSqlCtes(0.8)},
         |quality AS (
         |  SELECT doc_id, CAST(len($ws) AS BIGINT) AS n_tokens
         |  FROM documents WHERE len($ws) >= 20),
         |exact_keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text))
         |SELECT q.doc_id, q.n_tokens
         |FROM quality q
         |JOIN exact_keep e ON e.doc_id = q.doc_id
         |WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.doc_b = q.doc_id)
         |ORDER BY 1""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val quality = docs
      .withColumn("n_tokens", size(graft.ops.TextOps.words(col("text"))).cast("long"))
      .filter(col("n_tokens") >= 20)
    val exactKeep = DedupOps.exactDedup(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val losers = DedupOps.minhashNearDuplicates(docs, "doc_id", "text", 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
    quality
      .join(exactKeep, "doc_id")
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Per-document decision audit for the clean-corpus pipeline: WHY
    * each document survives or drops (quality gate, exact-dup winner,
    * near-dup loser) and the final keep verdict — the explainability
    * surface an operator of the pipeline debugs with. `keep` here is
    * certified equal to q_clean_corpus membership by construction of
    * the same CTEs.
    */
  val q_dedup_decisions = QueryDef(
    "q_dedup_decisions", {
      val ws = graft.ops.TextOps.wordsSql("text")
      s"""WITH ${DedupOps.minhashPairsSqlCtes(0.8)},
         |exact_win AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
         |SELECT d.doc_id,
         |  (len($ws) >= 20) AS quality_pass,
         |  (e.doc_id IS NOT NULL) AS is_exact_winner,
         |  (l.doc_id IS NOT NULL) AS is_neardup_loser,
         |  (len($ws) >= 20 AND e.doc_id IS NOT NULL AND l.doc_id IS NULL) AS keep
         |FROM documents d
         |LEFT JOIN exact_win e ON e.doc_id = d.doc_id
         |LEFT JOIN losers l ON l.doc_id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val qualityPass = size(graft.ops.TextOps.words(col("text"))) >= 20
    val exactWin = DedupOps.exactDedup(docs, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), lit(true).as("_win"))
    val losers = DedupOps.minhashNearDuplicates(docs, "doc_id", "text", 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("_lose", lit(true))
    docs.select(col("doc_id"), qualityPass.as("quality_pass"))
      .join(exactWin, Seq("doc_id"), "left")
      .join(losers, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_pass"),
        coalesce(col("_win"), lit(false)).as("is_exact_winner"),
        coalesce(col("_lose"), lit(false)).as("is_neardup_loser"),
        (col("quality_pass") && coalesce(col("_win"), lit(false)) &&
          !coalesce(col("_lose"), lit(false))).as("keep"))
      .orderBy(col("doc_id"))
  }

  /** Per-document duplicated-shingle rate — the exact-substring
    * duplication signal (Lee et al., "Deduplicating Training Data
    * Makes Language Models Better"): the fraction of a doc's distinct
    * shingles that occur in at least one OTHER document. Unlike the
    * pairwise families this needs no candidate generation at all — one
    * df count over the inverted index and a join back, linear in
    * corpus shingles at any scale.
    */
  val q_dup_ngram_rate = QueryDef(
    "q_dup_ngram_rate", {
      // UNCAPPED shingle table: the df-cap exists to bound similarity
      // JOIN fan-out, but here the only join is 1:1 against the df
      // count — and capping would delete precisely the most-duplicated
      // shingles, zeroing the rate for full-boilerplate docs (the
      // inverse of the metric)
      val sh = graft.ops.DedupOps.shingleTableSql("documents", "doc_id", "text")
      s"""WITH sh AS (
         |$sh),
         |df AS (
         |  SELECT h, CAST(COUNT(DISTINCT id) AS BIGINT) AS df
         |  FROM sh GROUP BY h),
         |per AS (
         |  SELECT sh.id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |    CAST(COALESCE(SUM(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END), 0)
         |      AS BIGINT) AS n_dup
         |  FROM sh JOIN df USING (h) GROUP BY sh.id)
         |SELECT d.doc_id, COALESCE(p.n_shingles, 0) AS n_shingles,
         |  COALESCE(p.n_dup, 0) AS n_dup,
         |  FLOOR(CAST(COALESCE(p.n_dup, 0) AS DOUBLE)
         |    / GREATEST(COALESCE(p.n_shingles, 0), 1) * 1000000 + 0.5)
         |    / 1000000.0 AS dup_rate
         |FROM documents d LEFT JOIN per p ON p.id = d.doc_id
         |ORDER BY d.doc_id""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val sh = graft.ops.Reuse.materialized(
      graft.ops.DedupOps.shingleTable(docs, "doc_id", "text"))
    val df = sh.groupBy(col("h")).agg(countDistinct(col("id")).as("df"))
    val per = sh.join(df, "h")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_shingles"),
        coalesce(sum((col("df") >= 2).cast("long")), lit(0L)).as("n_dup"))
    docs.select(col("doc_id"))
      .join(per.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_shingles"), lit(0L)).as("n_shingles"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"),
        (floor(coalesce(col("n_dup"), lit(0L)).cast("double")
          / greatest(coalesce(col("n_shingles"), lit(0L)), lit(1L))
          * 1000000 + 0.5) / 1000000.0).as("dup_rate"))
      .orderBy(col("doc_id"))
  }

  /** Maximal cross-document duplicated spans (substring-level dedup —
    * the granularity between [[q_segment_dedup]]'s lines and
    * [[q_dedup_exact]]'s whole docs): per doc, the merged character
    * intervals whose 20-char windows appear in at least one other
    * document, as (span count, covered chars, longest span, duplicated
    * fraction). The output a span-trimming curation pass consumes.
    */
  val q_dup_spans = QueryDef(
    "q_dup_spans",
    graft.ops.DedupOps.duplicatedSpansOracleSql("documents", "doc_id", "text")) {
    (spark, dir) =>
      graft.ops.DedupOps.duplicatedSpans(
        Tables.documents(spark, dir), "doc_id", "text")
  }

  /** Sorted-Neighborhood Method near-duplicates
    * ([[DedupOps.sortedNeighborhoodPairs]]): the third classic
    * candidate-generation strategy on the board next to LSH banding
    * (q_minhash_lsh) and the inverted index (q_ngram_jaccard) —
    * sort by a derived key, compare each record with its 2 sorted
    * successors, verify survivors with the same exact discriminative-
    * shingle Jaccard. Same measure, different candidate set: SNM's
    * recall is bounded by the sort key (mutations inside the first 4
    * chars escape), which is exactly the trade a curation pipeline
    * weighs against LSH's signature cost — having both certified
    * against one Jaccard definition makes the comparison honest.
    */
  val q_sorted_neighborhood = QueryDef(
    "q_sorted_neighborhood",
    DedupOps.sortedNeighborhoodOracleSql(0.5)) { (spark, dir) =>
    DedupOps.sortedNeighborhoodPairs(
      Tables.documents(spark, dir), "doc_id", "text", 0.5)
  }

  /** Bag (multiset) Jaccard near-duplicates
    * ([[DedupOps.bagJaccardPairs]]): the weighted companion to the set
    * measures — token FREQUENCIES enter the score (Σmin/Σmax), so
    * repetition-inflated docs stop matching single copies perfectly.
    * Candidates ride the same certified LSH banding as q_minhash_lsh;
    * only the verification measure changes, which is exactly how a
    * production dedup pass swaps similarity definitions without
    * re-engineering candidate generation.
    */
  val q_bag_jaccard = QueryDef(
    "q_bag_jaccard",
    DedupOps.bagJaccardOracleSql(0.5)) { (spark, dir) =>
    DedupOps.bagJaccardPairs(
      Tables.documents(spark, dir), "doc_id", "text", 0.5)
  }

  /** Fellegi–Sunter probabilistic record linkage over blocked customer
    * pairs — entity resolution when there is no shared key: candidates
    * come from an equi-join on (nation, $1000 balance band) blocking
    * keys (never all-pairs — the block key is the scale lever, same
    * posture as the dedup blocking above), then each comparison field
    * contributes a hard-coded integer log-odds weight (milli-bans:
    * agreement +, disagreement −, the m/u-probability ratios of the
    * FS model quantized once so both engines sum identical integers)
    * and pairs past the decision threshold come out as matches. Fields:
    * market segment equality, balance within $50 (exact-cents integer
    * distance), balance-sign agreement.
    */
  val q_record_linkage = QueryDef(
    "q_record_linkage",
    """WITH c AS (
      |  SELECT c_custkey AS id, c_mktsegment AS seg,
      |    CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
      |    CAST(c_nationkey AS BIGINT) AS nat
      |  FROM customer),
      |p AS (
      |  SELECT a.id AS cust_a, b.id AS cust_b,
      |    a.seg = b.seg AS seg_match,
      |    ABS(a.cents - b.cents) <= 5000 AS bal_close,
      |    (a.cents < 0) = (b.cents < 0) AS sign_match
      |  FROM c a JOIN c b
      |    ON a.nat = b.nat AND a.cents // 100000 = b.cents // 100000
      |    AND a.id < b.id),
      |s AS (
      |  SELECT cust_a, cust_b, seg_match, bal_close,
      |    CAST((CASE WHEN seg_match THEN 653 ELSE -903 END)
      |      + (CASE WHEN bal_close THEN 1100 ELSE -600 END)
      |      + (CASE WHEN sign_match THEN 120 ELSE -450 END) AS BIGINT)
      |      AS score_milli
      |  FROM p)
      |SELECT cust_a, cust_b, seg_match, bal_close, score_milli
      |FROM s WHERE score_milli >= 800
      |ORDER BY cust_a, cust_b""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).select(
      col("c_custkey").as("id"), col("c_mktsegment").as("seg"),
      round(col("c_acctbal") * 100).cast("long").as("cents"),
      col("c_nationkey").cast("long").as("nat"))
      .withColumn("blk", expr("cents DIV 100000"))
    c.as("a").join(c.as("b"),
        col("a.nat") === col("b.nat") && col("a.blk") === col("b.blk") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("cust_a"), col("b.id").as("cust_b"),
        (col("a.seg") === col("b.seg")).as("seg_match"),
        (abs(col("a.cents") - col("b.cents")) <= 5000).as("bal_close"),
        ((col("a.cents") < 0) === (col("b.cents") < 0)).as("sign_match"))
      .withColumn("score_milli",
        (when(col("seg_match"), 653L).otherwise(-903L) +
          when(col("bal_close"), 1100L).otherwise(-600L) +
          when(col("sign_match"), 120L).otherwise(-450L)).cast("long"))
      .filter(col("score_milli") >= 800)
      .select(col("cust_a"), col("cust_b"), col("seg_match"),
        col("bal_close"), col("score_milli"))
      .orderBy(col("cust_a"), col("cust_b"))
  }

  val all: Seq[QueryDef] = Seq(
    q_dup_ngram_rate, q_dup_spans,
    q_dedup_exact, q_minhash_lsh, q_simhash, q_ngram_jaccard,
    q_containment_pairs, q_minhash_est, q_segment_dedup,
    q_incremental_dedup, q_clean_corpus,
    q_dedup_decisions, q_sorted_neighborhood, q_record_linkage,
    q_bag_jaccard)
}
