package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.{DedupOps, TextOps, UrlOps}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-corpus curation operators beyond pairwise dedup: duplicate
  * GROUP resolution, deterministic stratified sampling, vocabulary
  * coverage, and text normalization — the operations that turn raw
  * crawl shards into a training mix at 100 TB.
  */
object CurationQueries {

  /** Near-dup groups with canonical winners: MinHash pairs (0.8) →
    * connected components → min-id representative. Oracle resolves the
    * same components with a recursive-CTE transitive closure over the
    * generated MinHash pair CTEs — chained duplicates (a~b~c with no
    * a~c pair) land in ONE group in both engines, which pairwise
    * checks alone cannot certify.
    */
  /** Per-process memo of the resolved near-dup GROUP TABLE at the 0.8
    * threshold, materialized to a work-dir parquet and keyed on the
    * documents fixture's content fingerprint (round-13, guide §1.2 /
    * §2.4 — remove repeated passes): [[q_dedup_groups]],
    * [[q_canonical_docs]], [[q_dup_cluster_sizes]] and
    * [[q_soft_dedup_sample]] all consume the IDENTICAL
    * `dedupGroups(documents, 0.8)` resolution (shingle → MinHash →
    * LSH pairs → connected components), and each was re-running the
    * full pipeline — exactly as a deployed curation pipeline
    * materializes ONE group table and serves every downstream
    * consumer from it. The lateDrains/fittedBasis accounting: Bench
    * clears the memo per pass, so each pass re-pays the resolution
    * once at its first consumer; BENCH_COLD probes each consumer's
    * standalone cold cost. [[q_dedup_groups_dist]] deliberately stays
    * on a live `dedupGroups` call — its whole purpose is to TIME the
    * distributed pointer-jumping path against the same oracle.
    */
  private val dedupGroupsCache =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  graft.ops.Memos.register(() => dedupGroupsCache.clear(),
    "q_dedup_groups", "q_canonical_docs", "q_dup_cluster_sizes",
    "q_soft_dedup_sample")

  private def sharedDedupGroups(
      spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.DataFrame = {
    val path = dedupGroupsCache.computeIfAbsent(
      s"$dir#${graft.ops.Memos.dirFingerprint(s"$dir/documents.parquet")}#0.8",
      { _ =>
        val out = graft.streaming.StreamingOps.tempSinkDir("graft_dedup_groups_")
        DedupOps.dedupGroups(Tables.documents(spark, dir), "doc_id", "text", 0.8)
          .write.mode("overwrite").parquet(out)
        out
      })
    spark.read.parquet(path)
  }

  val q_dedup_groups = QueryDef(
    "q_dedup_groups", {
      s"""WITH RECURSIVE ${DedupOps.minhashPairsSqlCtes(0.8)},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS rid FROM nodes
         |  UNION
         |  SELECT r.id, e.dst AS rid FROM reach r JOIN edges e ON e.src = r.rid),
         |lbl AS (SELECT id, MIN(rid) AS grp FROM reach GROUP BY id)
         |SELECT d.doc_id, COALESCE(l.grp, d.doc_id) AS group_id,
         |  (COALESCE(l.grp, d.doc_id) = d.doc_id) AS is_canonical
         |FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    sharedDedupGroups(spark, dir)
      .orderBy(col("doc_id"))
  }

  /** [[q_dedup_groups]] with the driver union-find gate forced OFF
    * (`localCcMaxEdges = 0`), so the distributed min-label
    * pointer-jumping rounds — the actual 100 TB path, which the gate
    * otherwise hides at bench scale — run, get TIMED by the driver
    * bench every round, and hash against the SAME certified oracle:
    * the distributed path is thereby proven result-identical to the
    * union-find path on every driver run, not just in specs.
    */
  val q_dedup_groups_dist = QueryDef(
    "q_dedup_groups_dist", q_dedup_groups.oracle.get) { (spark, dir) =>
    DedupOps.dedupGroups(Tables.documents(spark, dir), "doc_id", "text", 0.8,
      localCcMaxEdges = 0L)
      .orderBy(col("doc_id"))
  }

  private val SamplePerStratum = 20

  /** Deterministic exact-N stratified sample: per language, the first
    * `SamplePerStratum` docs in scrambled-hash order (id-hash, not
    * rand(): reproducible across engines AND across runs — the
    * property a training-mix manifest needs). At scale this is one
    * window per stratum, no global sort.
    */
  val q_stratified_sample = QueryDef(
    "q_stratified_sample",
    // (id % m) * C % m == (id * C) % m, but never overflows int64 —
    // the raw product would at doc_id ~3.5e9 (real at 100 TB)
    s"""SELECT doc_id, lang, rn FROM (
       |  SELECT doc_id, lang,
       |    ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000003, doc_id) AS rn
       |  FROM documents) t
       |WHERE rn <= $SamplePerStratum
       |ORDER BY lang, rn""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("lang"))
      .orderBy((col("doc_id") % 1000003L * lit(2654435761L)) % 1000003L, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= SamplePerStratum)
      .orderBy(col("lang"), col("rn"))
  }

  /** Vocabulary coverage: top-30 words with cumulative share of total
    * token mass — the tokenizer-budget panel (what fraction of the
    * corpus do the k most frequent types cover).
    */
  val q_vocab_coverage = QueryDef(
    "q_vocab_coverage", {
      val ws = TextOps.wordsSql("text")
      s"""WITH tf AS (
         |  SELECT w, COUNT(*) AS n
         |  FROM (SELECT unnest($ws) AS w FROM documents) GROUP BY w),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM tf)
         |SELECT w AS word, n, ROUND(CAST(cum AS DOUBLE) / total, 6) AS cum_share
         |FROM (
         |  SELECT w, n, CAST(SUM(n) OVER (ORDER BY n DESC, w
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM tf) t CROSS JOIN tot
         |ORDER BY n DESC, word LIMIT 30""".stripMargin
    }) { (spark, dir) =>
    val tf = Tables.documents(spark, dir)
      .select(explode(TextOps.words(col("text"))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("n"))
    val tot = broadcast(tf.agg(sum(col("n")).as("total")))
    // top-30 FIRST (TakeOrderedAndProject — scale-safe), then the
    // cumulative window runs over 30 rows instead of the whole
    // vocabulary in one partition; the prefix cumsum is identical
    val top = tf.orderBy(col("n").desc, col("w")).limit(30)
    val w = Window.orderBy(col("n").desc, col("w"))
      .rowsBetween(Window.unboundedPreceding, 0)
    top.withColumn("cum", sum(col("n")).over(w))
      .crossJoin(tot)
      .select(col("w").as("word"), col("n"),
        round(col("cum").cast("double") / col("total"), 6).as("cum_share"))
      .orderBy(col("n").desc, col("word"))
  }

  /** Text normalization (lowercase → strip non-alnum → collapse
    * whitespace → trim): the canonical-form column every exact-dedup
    * and fingerprint stage upstream of tokenization wants.
    */
  val q_text_normalize = QueryDef(
    "q_text_normalize",
    """SELECT doc_id,
      |  md5(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS norm_hash,
      |  CAST(len(trim(regexp_replace(regexp_replace(lower(text),
      |    '[^a-z0-9 ]', '', 'g'), ' +', ' ', 'g'))) AS BIGINT) AS norm_len
      |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    val norm = trim(regexp_replace(
      regexp_replace(lower(col("text")), "[^a-z0-9 ]", ""), " +", " "))
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(norm).as("norm_hash"),
        length(norm).cast("long").as("norm_len"))
      .orderBy(col("doc_id"))
  }

  private val PackBudget = 4096

  /** Sequence packing (concatenate-and-chop): docs concatenated in
    * id order within each language stream, chopped into fixed
    * `PackBudget`-token bins — bin id = floor(tokens-before-doc /
    * budget), the standard pretraining batch-prep step. One window +
    * one aggregation per stratum; the stratum key is the shuffle key
    * at scale.
    */
  val q_sequence_pack = QueryDef(
    "q_sequence_pack", {
      val ws = TextOps.wordsSql("text")
      s"""WITH toks AS (
         |  SELECT doc_id, lang, CAST(len($ws) AS BIGINT) AS n_tokens
         |  FROM documents),
         |cum AS (
         |  SELECT *, CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
         |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM toks)
         |SELECT lang, CAST(FLOOR((cum - n_tokens) / $PackBudget.0) AS BIGINT) AS bin,
         |  COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
         |FROM cum GROUP BY 1, 2 ORDER BY lang, bin""".stripMargin
    }) { (spark, dir) =>
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"),
        size(TextOps.words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .select(col("lang"),
        floor((col("cum") - col("n_tokens")) / lit(PackBudget.toDouble)).as("bin"),
        col("n_tokens"))
      .groupBy(col("lang"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
      .orderBy(col("lang"), col("bin"))
  }

  private val GreedyCap = 512

  /** EXACT greedy sequence packing — the no-span guarantee
    * [[q_sequence_pack]]'s offset-bin approximation cannot give: a
    * document NEVER crosses a context-window boundary (the SFT/eval
    * packing contract; bin packing by first-fit in doc order). The
    * decision for doc i depends on the running fill after doc i−1, so
    * this is genuinely sequential state — the scale shape is
    * repartition-by-shard + sortWithinPartitions + one streaming
    * mapPartitions scan (Spark's sort spills; the scan holds O(1)
    * state and never materializes a shard in memory), parallel ACROSS
    * shards, sequential within — exactly how packing shards out on a
    * real corpus. Docs longer than the cap get a window to themselves.
    * Oracle: per-shard recursive CTE replaying the same fold.
    */
  val q_pack_greedy = QueryDef(
    "q_pack_greedy", {
      val ws = TextOps.wordsSql("text")
      s"""WITH RECURSIVE toks AS (
         |  SELECT doc_id, CAST(doc_id % 8 AS BIGINT) AS shard,
         |    CAST(len($ws) AS BIGINT) AS n_tokens
         |  FROM documents WHERE len($ws) > 0),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS rn
         |  FROM toks),
         |rec AS (
         |  SELECT doc_id, shard, rn, n_tokens,
         |    CAST(0 AS BIGINT) AS window_seq, n_tokens AS fill
         |  FROM ranked WHERE rn = 1
         |  UNION ALL
         |  SELECT x.doc_id, x.shard, x.rn, x.n_tokens,
         |    CASE WHEN r.fill + x.n_tokens > $GreedyCap
         |         THEN r.window_seq + 1 ELSE r.window_seq END,
         |    CASE WHEN r.fill + x.n_tokens > $GreedyCap
         |         THEN x.n_tokens ELSE r.fill + x.n_tokens END
         |  FROM ranked x JOIN rec r ON x.shard = r.shard AND x.rn = r.rn + 1)
         |SELECT doc_id, shard, window_seq, n_tokens
         |FROM rec ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val cap = GreedyCap.toLong
    Tables.documents(spark, dir)
      .select(col("doc_id"), (col("doc_id") % 8).as("shard"),
        size(TextOps.words(col("text"))).cast("long").as("n_tokens"))
      .filter(col("n_tokens") > 0)
      .as[(Long, Long, Long)]
      // RANGE partition on shard, not hash: hash can co-locate several
      // of the 8 shards and idle the rest of the slots, while range
      // boundaries give each shard its own partition (equal keys can
      // never straddle a range boundary, so the sequential-within-
      // shard contract is preserved identically)
      .repartitionByRange(8, col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
      .mapPartitions { it =>
        // several shards may hash to one partition; state resets at
        // each shard boundary (rows arrive shard-sorted)
        var shard = Long.MinValue
        var win = 0L
        var fill = 0L
        it.map { case (id, s, n) =>
          if (s != shard) { shard = s; win = 0L; fill = 0L }
          else if (fill + n > cap) { win += 1; fill = 0L }
          fill += n
          (id, s, win, n)
        }
      }
      .toDF("doc_id", "shard", "window_seq", "n_tokens")
      .orderBy(col("doc_id"))
  }

  /** Benchmark decontamination: per-document share of its shingle set
    * that also appears in a held-out benchmark set (here: doc_id < 5
    * stands in for the eval corpus). The benchmark shingle set is
    * broadcast-joinable by construction (eval sets are tiny next to
    * training corpora); contaminated = overlap above 20%. Uses the
    * same codegen'd shingle hashing + oracle CTEs as the dedup family.
    */
  val q_contamination = QueryDef(
    "q_contamination", {
      val sh = DedupOps.shingleTableSql("documents", "doc_id", "text")
      s"""WITH sh AS (
         |  $sh),
         |bench AS (SELECT DISTINCT h FROM sh WHERE id < 5),
         |tot AS (SELECT id, COUNT(*) AS n_shingles FROM sh WHERE id >= 5 GROUP BY id),
         |hit AS (
         |  SELECT sh.id, COUNT(*) AS n_hits
         |  FROM sh JOIN bench USING (h) WHERE sh.id >= 5 GROUP BY sh.id)
         |SELECT t.id AS doc_id, t.n_shingles,
         |  COALESCE(h.n_hits, 0) AS n_overlap,
         |  FLOOR(CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_shingles * 1000000 + 0.5)
         |    / 1000000.0 AS overlap_ratio,
         |  (CAST(COALESCE(h.n_hits, 0) AS DOUBLE) / t.n_shingles > 0.2) AS contaminated
         |FROM tot t LEFT JOIN hit h ON h.id = t.id
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    // evictable eager persist, not pinned localCheckpoint (recomputable
    // from the codegen'd shingle pass; see graft.ops.Reuse)
    val sh = graft.ops.Reuse.materialized(
      DedupOps.shingleTable(Tables.documents(spark, dir), "doc_id", "text"))
    val bench = sh.filter(col("id") < 5).select(col("h")).distinct()
    val corpus = sh.filter(col("id") >= 5)
    val tot = corpus.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    val hits = corpus.join(broadcast(bench), "h")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    val ratio = coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_shingles")
    tot.join(hits, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_overlap"),
        (floor(ratio * 1000000 + 0.5) / lit(1000000.0)).as("overlap_ratio"),
        (ratio > 0.2).as("contaminated"))
      .orderBy(col("doc_id"))
  }

  /** Split-leakage audit: for every TEST-split document (same
    * group-consistent assignment as [[q_group_split]]), the share of
    * its shingles that also occur in ANY train-split document. Exact
    * duplicates can never leak (same text ⇒ same md5 group ⇒ same
    * split) — what this measures is the NEAR-duplicate leakage the
    * hash-group split cannot see, the number a training run actually
    * cares about before trusting its held-out loss. Scale shape: the
    * train shingle set is a distinct equi-join side (never broadcast —
    * at 100 TB it is most of the corpus), one shuffle on the shingle
    * hash; per-doc totals ride the same materialized shingle pass as
    * q_contamination.
    */
  val q_split_leakage = QueryDef(
    "q_split_leakage", {
      val sh = DedupOps.shingleTableSql("documents", "doc_id", "text")
      s"""WITH sh AS (
         |  $sh),
         |g AS (
         |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
         |  FROM documents),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN (((rep % 1000003) * 2654435761) % 1000003) % 10 < 8
         |         THEN 'train'
         |         WHEN (((rep % 1000003) * 2654435761) % 1000003) % 10 = 8
         |         THEN 'val' ELSE 'test' END AS split
         |  FROM g),
         |train_sh AS (
         |  SELECT DISTINCT h FROM sh JOIN sp ON sp.doc_id = sh.id
         |  WHERE sp.split = 'train'),
         |test_sh AS (
         |  SELECT sh.id, sh.h FROM sh JOIN sp ON sp.doc_id = sh.id
         |  WHERE sp.split = 'test'),
         |tot AS (SELECT id, COUNT(*) AS n_shingles FROM test_sh GROUP BY id),
         |hit AS (
         |  SELECT t.id, COUNT(*) AS n_hits
         |  FROM test_sh t JOIN train_sh USING (h) GROUP BY t.id)
         |SELECT tot.id AS doc_id, tot.n_shingles,
         |  COALESCE(hit.n_hits, 0) AS n_in_train,
         |  FLOOR(CAST(COALESCE(hit.n_hits, 0) AS DOUBLE) / tot.n_shingles
         |        * 1000000 + 0.5) / 1000000.0 AS leak_ratio
         |FROM tot LEFT JOIN hit ON hit.id = tot.id
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val w = Window.partitionBy(md5(col("text")))
    val bucket = ((col("rep") % 1000003L) * 2654435761L) % 1000003L % 10
    val split = docs
      .select(col("doc_id"), min(col("doc_id")).over(w).as("rep"))
      .select(col("doc_id"),
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
          .as("split"))
    val sh = graft.ops.Reuse.materialized(
      DedupOps.shingleTable(docs, "doc_id", "text"))
      .join(split, col("id") === col("doc_id"))
      .select(col("id"), col("h"), col("split"))
    val trainSh = sh.filter(col("split") === "train").select(col("h")).distinct()
    val testSh = sh.filter(col("split") === "test")
    val tot = testSh.groupBy(col("id")).agg(count(lit(1)).as("n_shingles"))
    val hits = testSh.join(trainSh, "h")
      .groupBy(col("id")).agg(count(lit(1)).as("n_hits"))
    val ratio =
      coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_shingles")
    tot.join(hits, Seq("id"), "left")
      .select(col("id").as("doc_id"), col("n_shingles"),
        coalesce(col("n_hits"), lit(0L)).as("n_in_train"),
        (floor(ratio * 1000000 + 0.5) / lit(1000000.0)).as("leak_ratio"))
      .orderBy(col("doc_id"))
  }

  private val MixShares: Seq[(String, Double)] = Seq(
    "en" -> 0.4, "de" -> 0.15, "es" -> 0.15, "fr" -> 0.15, "zh" -> 0.15)

  /** Language-mix rebalancing: given target token shares, the
    * per-stratum sampling rate `min(1, share·total / actual)` that
    * moves the corpus toward the target without upsampling — the
    * data-mixing-weights computation behind every training-mix
    * manifest. Two aggregations + a broadcast of 5 rows.
    */
  val q_mix_rates = QueryDef(
    "q_mix_rates", {
      val ws = TextOps.wordsSql("text")
      val shares = MixShares.map { case (l, s) => s"('$l', CAST($s AS DOUBLE))" }
        .mkString(", ")
      s"""WITH actual AS (
         |  SELECT lang, CAST(SUM(len($ws)) AS BIGINT) AS actual_tokens
         |  FROM documents GROUP BY lang),
         |tot AS (SELECT CAST(SUM(actual_tokens) AS BIGINT) AS total FROM actual),
         |tgt(lang, share) AS (VALUES $shares)
         |SELECT a.lang AS lang, a.actual_tokens, t.share AS target_share,
         |  FLOOR(LEAST(CAST(1.0 AS DOUBLE),
         |    t.share * tot.total / a.actual_tokens) * 1000000 + 0.5) / 1000000.0
         |    AS sample_rate,
         |  CAST(FLOOR(LEAST(CAST(1.0 AS DOUBLE),
         |    t.share * tot.total / a.actual_tokens) * a.actual_tokens) AS BIGINT)
         |    AS sampled_tokens
         |FROM actual a JOIN tgt t ON t.lang = a.lang CROSS JOIN tot
         |ORDER BY a.lang""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val actual = Tables.documents(spark, dir)
      .groupBy(col("lang"))
      .agg(sum(size(TextOps.words(col("text"))).cast("long")).as("actual_tokens"))
    val tot = broadcast(actual.agg(sum(col("actual_tokens")).as("total")))
    val tgt = broadcast(MixShares.toDF("lang", "target_share"))
    val rate = least(lit(1.0),
      col("target_share") * col("total") / col("actual_tokens"))
    actual.join(tgt, "lang").crossJoin(tot)
      .select(col("lang"), col("actual_tokens"), col("target_share"),
        (floor(rate * 1000000 + 0.5) / lit(1000000.0)).as("sample_rate"),
        floor(rate * col("actual_tokens")).cast("long").as("sampled_tokens"))
      .orderBy(col("lang"))
  }

  /** Quality-weighted deterministic sampling: keep a document with
    * probability proportional to its quality weight, decided by the
    * scrambled-id hash fraction (reproducible, engine-independent —
    * no rand()). The standard soft-filter between hard quality gates
    * and uniform sampling.
    */
  val q_weighted_sample = QueryDef(
    "q_weighted_sample", {
      val ws = TextOps.wordsSql("text")
      s"""SELECT doc_id, n_tokens,
         |  FLOOR(w * 1000000 + 0.5) / 1000000.0 AS weight
         |FROM (
         |  SELECT doc_id, len($ws) AS n_tokens,
         |    LEAST(CAST(1.0 AS DOUBLE), len($ws) / CAST(100.0 AS DOUBLE)) AS w,
         |    (((doc_id % 1000000) * 2654435761) % 1000000) / 1000000.0 AS frac
         |  FROM documents) t
         |WHERE frac < w
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val nTok = size(TextOps.words(col("text"))).cast("long")
    val w = least(lit(1.0), nTok / lit(100.0))
    val frac = (col("doc_id") % 1000000L * lit(2654435761L)) % 1000000L / lit(1000000.0)
    Tables.documents(spark, dir)
      .select(col("doc_id"), nTok.as("n_tokens"), w.as("w"), frac.as("frac"))
      .filter(col("frac") < col("w"))
      .select(col("doc_id"), col("n_tokens"),
        (floor(col("w") * 1000000 + 0.5) / lit(1000000.0)).as("weight"))
      .orderBy(col("doc_id"))
  }

  /** Unigram-LM quality score: mean per-token log-probability of each
    * document under the corpus unigram distribution — the classic
    * cheap LM-based quality filter between heuristic gates and a real
    * model. Per-token contributions ln(cnt_w / N) are micro-quantized
    * BEFORE the per-doc integer sum (order-free; `ln` may differ in
    * the last ulp between libm and the JVM — same policy as BM25).
    * Scale: the vocabulary count table is broadcast-sized (distinct
    * words ≪ corpus) and the per-doc aggregation is one shuffle.
    */
  val q_lm_quality = QueryDef(
    "q_lm_quality", {
      val ws = TextOps.wordsSql("text")
      s"""WITH toks AS (
         |  SELECT doc_id, unnest($ws) AS w FROM documents),
         |vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt FROM toks GROUP BY w),
         |n AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM vocab),
         |contrib AS (
         |  SELECT toks.doc_id,
         |    CAST(FLOOR(ln(CAST(cnt AS DOUBLE) / total) * 1000000 + 0.5) AS BIGINT)
         |      AS ci
         |  FROM toks JOIN vocab USING (w) CROSS JOIN n)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |  CAST(FLOOR(CAST(SUM(ci) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
         |    AS avg_logprob_micro
         |FROM contrib GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    // spread first (round-13): tokenize + explode feed BOTH the vocab
    // build and the contribution join, each otherwise single-task
    val toks = graft.ops.Reuse.spreadToCores(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), explode(TextOps.words(col("text"))).as("w"))
    // materialized: the total-tokens branch would otherwise re-run the
    // corpus explode+groupBy (vocab is vocabulary-sized — tiny)
    val vocab = graft.ops.Reuse.materialized(
      toks.groupBy(col("w")).agg(count(lit(1)).as("cnt")))
    val n = broadcast(vocab.agg(sum(col("cnt")).as("total")))
    toks.join(broadcast(vocab), "w").crossJoin(n)
      .select(col("doc_id"),
        floor(log(col("cnt").cast("double") / col("total")) * 1000000 + 0.5)
          .cast("long").as("ci"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        floor(sum(col("ci")).cast("double") / count(lit(1)) + 0.5)
          .cast("long").as("avg_logprob_micro"))
      .orderBy(col("doc_id"))
  }

  /** Near-duplication rate per source — the data-quality rollup a
    * crawl-snapshot triage starts from: how much of each source is
    * near-dup losers. Composes the certified MinHash pair CTEs; the
    * per-source aggregation is a broadcast-sized rollup.
    */
  val q_dup_rate_by_source = QueryDef(
    "q_dup_rate_by_source", {
      s"""WITH ${DedupOps.minhashPairsSqlCtes(0.8)},
         |losers AS (SELECT DISTINCT doc_b AS doc_id FROM pairs)
         |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(l.doc_id) AS BIGINT) AS n_losers,
         |  FLOOR(CAST(COUNT(l.doc_id) AS DOUBLE) / COUNT(*) * 10000 + 0.5)
         |    / 10000.0 AS dup_rate
         |FROM documents d LEFT JOIN losers l ON l.doc_id = d.doc_id
         |GROUP BY d.source
         |ORDER BY d.source""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val losers = DedupOps.minhashNearDuplicates(docs, "doc_id", "text", 0.8)
      .select(col("doc_b").as("doc_id")).distinct()
      .withColumn("_lose", lit(1L))
    docs.select(col("doc_id"), col("source"))
      .join(losers, Seq("doc_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("_lose")).as("n_losers"))
      .select(col("source"), col("n_docs"), col("n_losers"),
        (floor(col("n_losers").cast("double") / col("n_docs") * 10000 + 0.5)
          / lit(10000.0)).as("dup_rate"))
      .orderBy(col("source"))
  }

  /** Cross-source shingle overlap: Jaccard similarity between the
    * DISTINCT discriminative-shingle sets of every source pair — the
    * crawl-snapshot / cross-dump contamination matrix. Candidate
    * generation is the inverted index again (pair meets only on a
    * shared shingle; per-shingle fan-out ≤ n_sources²) and the output
    * is bounded by n_sources² rows — broadcast-sized at any corpus
    * scale.
    */
  val q_source_overlap = QueryDef(
    "q_source_overlap", {
      val shCtes = DedupOps.discriminativeShinglesSqlCtes("documents", "doc_id", "text")
      s"""WITH $shCtes,
         |ssh AS (
         |  SELECT DISTINCT d.source, sh.h
         |  FROM sh JOIN documents d ON d.doc_id = sh.id),
         |ssz AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n FROM ssh GROUP BY source),
         |inter AS (
         |  SELECT a.source AS source_a, b.source AS source_b,
         |    CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM ssh a JOIN ssh b ON a.h = b.h AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT i.source_a, i.source_b, i.inter,
         |  FLOOR(CAST(i.inter AS DOUBLE) / (sa.n + sb.n - i.inter) * 10000 + 0.5)
         |    / 10000.0 AS jaccard
         |FROM inter i
         |JOIN ssz sa ON sa.source = i.source_a
         |JOIN ssz sb ON sb.source = i.source_b
         |ORDER BY source_a, source_b""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    // materialized: ssh feeds ssz AND both sides of the aliased
    // self-join (fresh expression ids defeat exchange reuse)
    val ssh = graft.ops.Reuse.materialized(
      DedupOps.discriminativeShingles(docs, "doc_id", "text")
        .join(docs.select(col("doc_id").as("id"), col("source")), "id")
        .select(col("source"), col("h")).distinct())
    val ssz = ssh.groupBy(col("source")).agg(count(lit(1)).as("n"))
    ssh.as("a").join(ssh.as("b"),
        col("a.h") === col("b.h") && col("a.source") < col("b.source"))
      .groupBy(col("a.source").as("source_a"), col("b.source").as("source_b"))
      .agg(count(lit(1)).as("inter"))
      .join(ssz.withColumnRenamed("source", "source_a").withColumnRenamed("n", "na"),
        "source_a")
      .join(ssz.withColumnRenamed("source", "source_b").withColumnRenamed("n", "nb"),
        "source_b")
      .select(col("source_a"), col("source_b"), col("inter"),
        (floor(col("inter").cast("double") / (col("na") + col("nb") - col("inter"))
          * 10000 + 0.5) / lit(10000.0)).as("jaccard"))
      .orderBy(col("source_a"), col("source_b"))
  }

  /** Sketch-algebra cross-source overlap: the SAME contamination
    * matrix as [[q_source_overlap]], but from per-source HLL sketches
    * with NO pairwise shingle join — union registers max-merge and the
    * intersection follows by inclusion–exclusion
    * ([[graft.ops.SketchOps.hllOverlap]]). At 100 TB the exact form
    * must equi-join every source pair's full shingle sets; this one
    * does ONE linear scan, then works on 256 registers per source.
    * Hash-certified (the estimator chain is the proven HLL pattern),
    * with accuracy vs the exact sibling audited in SketchOpsSpec.
    */
  val q_hll_overlap = QueryDef(
    "q_hll_overlap", {
      val shCtes = DedupOps.discriminativeShinglesSqlCtes("documents", "doc_id", "text")
      graft.ops.SketchOps.hllOverlapOracleSql(
        s"""$shCtes,
           |src AS (
           |  SELECT d.source AS grp, CAST(sh.h AS VARCHAR) AS kstr
           |  FROM sh JOIN documents d ON d.doc_id = sh.id)""".stripMargin)
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val keyed = DedupOps.discriminativeShingles(docs, "doc_id", "text")
      .join(docs.select(col("doc_id").as("id"), col("source")), "id")
      .select(col("source"), col("h"))
    graft.ops.SketchOps.hllOverlap(keyed, "source", "h")
  }

  /** Email-address pattern valid (and identical in semantics) in both
    * Java regex (Spark) and RE2 (DuckDB): character classes, +, and a
    * bounded repetition only.
    */
  private[graft] val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"

  /** PII scrub: count and redact email-shaped spans — the standard
    * pre-training redaction pass, certified end-to-end (count + md5 of
    * the scrubbed text). Pure codegen'd column algebra; the pattern set
    * extends per deployment (phone/SSN/etc. are more alternations in
    * the same shape). On this synthetic corpus every count is 0 and
    * scrubbed == original — the certification is of the operator
    * plumbing (dialect-portable pattern, replace-all semantics), which
    * is exactly what a user pointing the engine at a real corpus
    * relies on.
    */
  val q_pii_scrub = QueryDef(
    "q_pii_scrub",
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(lower(text), '$EmailRe')) AS BIGINT)
       |    AS n_emails,
       |  md5(regexp_replace(lower(text), '$EmailRe', '<EMAIL>', 'g'))
       |    AS scrubbed_md5
       |FROM documents ORDER BY doc_id""".stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_count(lower(col("text")), lit(EmailRe)).cast("long").as("n_emails"),
        md5(regexp_replace(lower(col("text")), EmailRe, "<EMAIL>"))
          .as("scrubbed_md5"))
      .orderBy(col("doc_id"))
  }

  /** Count-aware soft dedup sampling: instead of keeping ONE canonical
    * doc per near-dup class (hard dedup), keep each member with
    * probability 1/√(class size) — the modern recipe that preserves a
    * frequency signal (√k copies of a k-duplicated doc survive in
    * expectation) without letting boilerplate dominate. Composes the
    * certified connected-components groups; the keep decision is the
    * deterministic id-hash fraction, so the sample is reproducible and
    * cross-engine identical. √k and the 1e-6-grid rate are IEEE-
    * identical on identical integer sizes in both engines.
    */
  val q_soft_dedup_sample = QueryDef(
    "q_soft_dedup_sample", {
      s"""WITH RECURSIVE ${DedupOps.minhashPairsSqlCtes(0.8)},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS rid FROM nodes
         |  UNION
         |  SELECT r.id, e.dst AS rid FROM reach r JOIN edges e ON e.src = r.rid),
         |lbl AS (SELECT id, MIN(rid) AS grp FROM reach GROUP BY id),
         |grps AS (
         |  SELECT d.doc_id, COALESCE(l.grp, d.doc_id) AS group_id
         |  FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id),
         |sizes AS (SELECT group_id, CAST(COUNT(*) AS BIGINT) AS group_size
         |          FROM grps GROUP BY group_id)
         |SELECT g.doc_id, g.group_id, s.group_size,
         |  FLOOR(1.0 / sqrt(CAST(s.group_size AS DOUBLE)) * 1000000 + 0.5)
         |    / 1000000.0 AS sample_rate,
         |  ((((g.doc_id % 1000000) * 2654435761) % 1000000) / 1000000.0
         |    < FLOOR(1.0 / sqrt(CAST(s.group_size AS DOUBLE)) * 1000000 + 0.5)
         |      / 1000000.0) AS kept
         |FROM grps g JOIN sizes s ON s.group_id = g.group_id
         |ORDER BY g.doc_id""".stripMargin
    }) { (spark, dir) =>
    val groups = sharedDedupGroups(spark, dir)
      .select(col("doc_id"), col("group_id"))
    val sizes = groups.groupBy(col("group_id")).agg(count(lit(1)).as("group_size"))
    val rate = floor(lit(1.0) / sqrt(col("group_size").cast("double"))
      * 1000000 + 0.5) / lit(1000000.0)
    val frac = (col("doc_id") % 1000000L * lit(2654435761L)) % 1000000L / lit(1000000.0)
    groups.join(sizes, "group_id")
      .select(col("doc_id"), col("group_id"), col("group_size"),
        rate.as("sample_rate"), (frac < rate).as("kept"))
      .orderBy(col("doc_id"))
  }

  /** Bigram conditional-LM quality score: mean ln P(w_i | w_{i-1})
    * under the corpus bigram distribution — one model order above
    * [[q_lm_quality]]'s unigram score and a sharper fluency signal
    * (repetitive boilerplate scores high on unigrams but its
    * transitions give it away). Context counts come from the bigram
    * table itself, so the conditional sums to 1 over observed
    * continuations. Same micro-quantized order-free sum policy; both
    * count tables are vocabulary-bounded (broadcast side).
    */
  val q_bigram_lm = QueryDef(
    "q_bigram_lm", {
      val ws = TextOps.wordsSql("text")
      s"""WITH docs_ws AS (
         |  SELECT doc_id, $ws AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id, ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
         |  FROM docs_ws CROSS JOIN UNNEST(range(1, len(ws))) t(i)),
         |c2 AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS c1 FROM bg GROUP BY 1),
         |contrib AS (
         |  SELECT bg.doc_id,
         |    CAST(FLOOR(ln(CAST(c2.c2 AS DOUBLE) / c1.c1) * 1000000 + 0.5) AS BIGINT)
         |      AS ci
         |  FROM bg JOIN c2 ON c2.w1 = bg.w1 AND c2.w2 = bg.w2
         |          JOIN c1 ON c1.w1 = bg.w1)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |  CAST(FLOOR(CAST(SUM(ci) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
         |    AS avg_logprob_micro
         |FROM contrib GROUP BY doc_id
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    // spread first: tokenization + the bigram explode otherwise run
    // twice on one task (c2 build + probe side; round-13)
    val docsWs = graft.ops.Reuse.spreadToCores(
      Tables.documents(spark, dir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), TextOps.words(col("text")).as("ws"))
      .filter(size(col("ws")) >= 2) // sequence(1, 0) would count DOWN
    val bg = docsWs.select(col("doc_id"),
      explode(expr(
        "transform(sequence(1, size(ws) - 1), " +
          "i -> struct(element_at(ws, i) AS w1, element_at(ws, i + 1) AS w2))"))
        .as("g"))
      .select(col("doc_id"), col("g.w1").as("w1"), col("g.w2").as("w2"))
    val c2 = graft.ops.Reuse.materialized(
      bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2")))
    val c1 = c2.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    bg.join(broadcast(c2), Seq("w1", "w2"))
      .join(broadcast(c1), Seq("w1"))
      .select(col("doc_id"),
        floor(log(col("c2").cast("double") / col("c1")) * 1000000 + 0.5)
          .cast("long").as("ci"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(sum(col("ci")).cast("double") / count(lit(1)) + 0.5)
          .cast("long").as("avg_logprob_micro"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic train/val/test split (80/10/10 by multiplicative
    * id-hash bucket — the same overflow-safe `(id % p) * C % p` used
    * by the samplers, so assignment is reproducible on any engine and
    * stable under re-partitioning). Output is the split MANIFEST a
    * pipeline stores next to the data: doc + token counts and an
    * order-free id checksum per split — enough to audit that a later
    * rerun produced the identical partition without comparing id
    * lists. */
  val q_dataset_split = QueryDef(
    "q_dataset_split",
    s"""WITH b AS (
       |  SELECT doc_id,
       |    (((doc_id % 1000003) * 2654435761) % 1000003) % 10 AS bucket,
       |    len(${graft.ops.TextOps.wordsSql("text")}) AS n_tokens
       |  FROM documents)
       |SELECT CASE WHEN bucket < 8 THEN 'train'
       |            WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
       |  COUNT(*) AS n_docs,
       |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
       |FROM b GROUP BY 1 ORDER BY split""".stripMargin) { (spark, dir) =>
    val bucket = ((col("doc_id") % 1000003L) * 2654435761L) % 1000003L % 10
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
          .as("split"),
        size(graft.ops.TextOps.words(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("split"))
  }

  /** Leakage-safe GROUP-aware dataset split: q_dataset_split hashes
    * each doc independently, which lets two copies of the same text
    * land in train AND test — the classic eval-contamination bug. Here
    * the split is decided by the duplicate GROUP's representative
    * (min doc_id per content hash), so a group moves as one unit by
    * construction: the same overflow-safe multiplicative hash, applied
    * to `rep` instead of `doc_id`. One shuffle (the window over the
    * content hash); the certified columns pin the exact doc→split
    * assignment (id_checksum) plus the group census per split. The
    * `rep` key generalizes to any grouping — swap in the connected-
    * component id from [[DedupOps]] near-dup groups for fuzzy-leakage
    * safety (same plan shape; that variant's oracle would need the CC
    * replay, so the exact-dup group is the certified form).
    */
  val q_group_split = QueryDef(
    "q_group_split",
    """WITH g AS (
      |  SELECT doc_id, MIN(doc_id) OVER (PARTITION BY md5(text)) AS rep
      |  FROM documents),
      |b AS (
      |  SELECT doc_id, rep,
      |    (((rep % 1000003) * 2654435761) % 1000003) % 10 AS bucket
      |  FROM g)
      |SELECT CASE WHEN bucket < 8 THEN 'train'
      |            WHEN bucket = 8 THEN 'val' ELSE 'test' END AS split,
      |  COUNT(*) AS n_docs,
      |  COUNT(DISTINCT rep) AS n_groups,
      |  CAST(SUM(doc_id) AS BIGINT) AS id_checksum
      |FROM b GROUP BY 1 ORDER BY split""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(md5(col("text")))
    val bucket = ((col("rep") % 1000003L) * 2654435761L) % 1000003L % 10
    Tables.documents(spark, dir)
      .select(col("doc_id"), min(col("doc_id")).over(w).as("rep"))
      .select(col("doc_id"), col("rep"),
        when(bucket < 8, "train").when(bucket === 8, "val").otherwise("test")
          .as("split"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        count_distinct(col("rep")).as("n_groups"),
        sum(col("doc_id")).as("id_checksum"))
      .orderBy(col("split"))
  }

  /** Host canonicalization + per-host caps: the standard crawl-curation
    * guard against any single domain dominating the training mix.
    * Messy URL fixtures (scheme/host case, `www.`, ports, userinfo,
    * tracking params — [[UrlOps.urlFixture]]) are canonicalized to one
    * host key with portable regex column algebra, counted per host, and
    * capped at [[HostCap]] docs per host selected in scrambled-id-hash
    * order (reproducible across engines and runs, like the other
    * sampling panels; NOT rand()).
    *
    * 100 TB shape: one shuffle on the canonical host for the count +
    * rank window; the cap filter discards inside the window stage, so
    * a mega-host's overflow never reaches downstream operators. (A
    * pathological single-host corpus would additionally pre-aggregate
    * with a salted count before ranking — the certified per-host counts
    * here make that swap observable.)
    */
  val HostCap = 10
  val q_host_caps = QueryDef(
    "q_host_caps",
    s"""WITH u AS (
       |  SELECT doc_id,
       |    ${UrlOps.urlFixtureSql("doc_id", "source")} AS url
       |  FROM documents),
       |h AS (
       |  SELECT doc_id, ${UrlOps.canonicalHostSql("url")} AS host FROM u),
       |r AS (
       |  SELECT doc_id, host,
       |    CAST(COUNT(*) OVER (PARTITION BY host) AS BIGINT) AS host_total,
       |    CAST(ROW_NUMBER() OVER (PARTITION BY host
       |      ORDER BY ((doc_id % 1000003) * 2654435761) % 1000003, doc_id)
       |      AS BIGINT) AS rn
       |  FROM h)
       |SELECT doc_id, host, host_total, rn
       |FROM r WHERE rn <= $HostCap
       |ORDER BY host, rn""".stripMargin) { (spark, dir) =>
    val w = Window.partitionBy(col("host"))
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"),
        UrlOps.urlFixture(col("doc_id"), col("source")).as("url"))
      .select(col("doc_id"), UrlOps.canonicalHost(col("url")).as("host"))
    docs
      .select(col("doc_id"), col("host"),
        count(lit(1)).over(w).as("host_total"),
        row_number().over(w.orderBy(
          (col("doc_id") % 1000003L * lit(2654435761L)) % 1000003L,
          col("doc_id"))).cast("long").as("rn"))
      .filter(col("rn") <= HostCap)
      .orderBy(col("host"), col("rn"))
  }

  /** Content-aware canonical selection over near-dup groups — the step
    * after group resolution that dedup pipelines actually ship: each
    * MinHash+CC group keeps its LONGEST member (tie → lowest id), the
    * "best representative" policy of crawl curation. Argmax runs as a
    * map-side-combinable encoded-min aggregate (length complement and
    * id packed into one long) over the certified q_dedup_groups
    * labels — no window, no sort, one hash-agg shuffle on group_id.
    */
  val q_canonical_docs = QueryDef(
    "q_canonical_docs", {
      s"""WITH RECURSIVE ${graft.ops.DedupOps.minhashPairsSqlCtes(0.8)},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS rid FROM nodes
         |  UNION
         |  SELECT r.id, e.dst AS rid FROM reach r JOIN edges e ON e.src = r.rid),
         |lbl AS (SELECT id, MIN(rid) AS grp FROM reach GROUP BY id),
         |g AS (
         |  SELECT d.doc_id, COALESCE(l.grp, d.doc_id) AS group_id,
         |    LEAST(d.n_chars, 99999) AS nc
         |  FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id)
         |SELECT group_id,
         |  CAST(MIN((99999 - nc) * 1099511627776 + doc_id) % 1099511627776
         |    AS BIGINT) AS canonical_id,
         |  CAST(99999 - MIN((99999 - nc) * 1099511627776 + doc_id)
         |    // 1099511627776 AS BIGINT) AS canonical_chars,
         |  CAST(COUNT(*) AS BIGINT) AS n_members
         |FROM g GROUP BY 1 ORDER BY group_id""".stripMargin
    }) { (spark, dir) =>
    val docs = Tables.documents(spark, dir)
    val groups = sharedDedupGroups(spark, dir)
    groups
      .join(docs.select(col("doc_id"),
        least(col("n_chars"), lit(99999L)).as("nc")), "doc_id")
      .groupBy(col("group_id"))
      .agg(min((lit(99999L) - col("nc")) * (1L << 40) + col("doc_id"))
        .as("enc"), count(lit(1)).as("n_members"))
      .select(col("group_id"),
        (col("enc") % (1L << 40)).as("canonical_id"),
        (lit(99999L) - expr("enc div 1099511627776")).as("canonical_chars"),
        col("n_members"))
      .orderBy(col("group_id"))
  }

  /** RAG-style sliding-window document chunking: fixed 200-char
    * windows advancing by 150 (50-char overlap), the retrieval-corpus
    * preparation step upstream of embedding (reference analogue: the
    * embedding consumer's text assembly before vectorization,
    * `embedding_consumer.py:94-118`). Pure codegen column algebra —
    * `sequence` + `explode` + `substr`, no UDF — so at 100 TB the
    * chunk fan-out happens inside whole-stage codegen with zero
    * shuffles (the output partitioning inherits the scan's). Chunk
    * CONTENT is certified by md5, chunk GRID by (chunk_idx, start,
    * chunk_len) row multiplicity.
    */
  val q_doc_chunks: QueryDef = {
    val ChunkLen = 200
    val Step = 150 // = ChunkLen - 50-char overlap
    QueryDef(
      "q_doc_chunks",
      s"""WITH m AS (
         |  SELECT doc_id, text, len(text) AS n
         |  FROM documents WHERE len(text) > 0),
         |c AS (
         |  SELECT doc_id, CAST(g AS BIGINT) AS start, text
         |  FROM m CROSS JOIN UNNEST(range(0, n, $Step)) t(g))
         |SELECT doc_id, start // $Step AS chunk_idx, start,
         |  CAST(len(substr(text, CAST(start + 1 AS INT), $ChunkLen)) AS BIGINT)
         |    AS chunk_len,
         |  md5(substr(text, CAST(start + 1 AS INT), $ChunkLen)) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
      Tables.documents(spark, dir)
        .select(col("doc_id"), col("text"), length(col("text")).as("n"))
        .where(col("n") > 0)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), col("n").cast("long") - 1, lit(Step.toLong)))
            .as("start"))
        .select(col("doc_id"),
          (col("start") / Step).cast("long").as("chunk_idx"),
          col("start"),
          expr(s"substr(text, start + 1, $ChunkLen)").as("chunk"))
        .select(col("doc_id"), col("chunk_idx"), col("start"),
          length(col("chunk")).cast("long").as("chunk_len"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }
  }

  /** Content-defined chunking (CDC): chunk boundaries are placed where
    * the rolling 8-char window hash ≡ 0 (mod 64) — a function of LOCAL
    * content only, so an insertion or deletion reshapes at most the
    * chunks it touches while every boundary downstream re-synchronizes
    * (fixed-size chunking shifts every subsequent chunk — the property
    * that makes CDC the chunking layer under storage/training-corpus
    * chunk dedup; certified stability spec in CdcChunkSpec). Expected
    * chunk length = the 64-char modulus. Engine: one codegen
    * rolling-hash pass per doc ([[graft.functions.ShinglePosHashes]] —
    * the SAME certified hash the shingle index uses), boundary
    * selection and segmentation as pure array algebra (transform /
    * filter / array_distinct / posexplode), no sequential state and no
    * shuffle before the sort. Oracle replays the hash per position via
    * `substr` + the shared polynomial rendering
    * ([[TextOps.polyHashSql]], exact in BIGINT at n=8).
    */
  /** Shared oracle CTE prefix ending in the CDC chunk table
    * `ch(doc_id, chunk_idx, start, chunk_len, chunk_md5)`.
    */
  private def cdcCtes: String = {
    val h = TextOps.polyHashSql("substr(text, CAST(g AS INT), 8)", 8)
    s"""d AS MATERIALIZED (
       |  SELECT doc_id, text, CAST(len(text) AS BIGINT) AS ln FROM documents),
       |pos AS MATERIALIZED (
       |  SELECT doc_id, CAST(g + 7 AS BIGINT) AS cut
       |  FROM d CROSS JOIN UNNEST(range(1, GREATEST(ln - 7, 0) + 1)) t(g)
       |  WHERE $h % 64 = 0 AND g + 7 < ln),
       |b AS MATERIALIZED (
       |  SELECT DISTINCT doc_id, c FROM (
       |    SELECT doc_id, CAST(0 AS BIGINT) AS c FROM d
       |    UNION ALL SELECT doc_id, cut FROM pos
       |    UNION ALL SELECT doc_id, ln FROM d)),
       |s AS (SELECT doc_id, c,
       |    LEAD(c) OVER (PARTITION BY doc_id ORDER BY c) AS nxt,
       |    ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY c) AS k
       |  FROM b),
       |ch AS MATERIALIZED (
       |  SELECT s.doc_id, CAST(k AS BIGINT) AS chunk_idx, c AS start,
       |    nxt - c AS chunk_len,
       |    md5(substr(text, CAST(c AS INT) + 1, CAST(nxt - c AS INT)))
       |      AS chunk_md5
       |  FROM s JOIN d USING (doc_id) WHERE nxt IS NOT NULL)""".stripMargin
  }

  val q_cdc_chunks: QueryDef = QueryDef(
    "q_cdc_chunks",
    s"""WITH $cdcCtes
       |SELECT doc_id, chunk_idx, start, chunk_len, chunk_md5
       |FROM ch ORDER BY doc_id, chunk_idx""".stripMargin) { (spark, dir) =>
    cdcChunkRows(Tables.documents(spark, dir))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  /** The CDC chunk table (shared by q_cdc_chunks and q_cdc_dedup). */
  private[graft] def cdcChunkRows(
      docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    // Materialize the bounds stage: the downstream `chunks` transform
    // reads `bounds` once per sequence element, and CollapseProject
    // would otherwise inline the whole hash→transform→filter chain
    // into EVERY element_at — the deferred-projection re-evaluation
    // trap (same failure mode the sketch-ANN corpus tuple documents),
    // measured here as 11 s → ~1 s at sf0.1.
    val bounded = graft.ops.Reuse.materialized(
      docs.select(col("doc_id"), col("text"))
        .withColumn("ln", length(col("text")).cast("long"))
        .withColumn("cuts", filter(
          transform(expr("shingle_pos_hashes(text, 8)"),
            (h, i) => when(pmod(h, lit(64L)) === 0, i.cast("long") + 8L)
              .otherwise(-1L)),
          x => x > 0 && x < col("ln")))
        .withColumn("bounds", array_distinct(
          concat(array(lit(0L)), col("cuts"), array(col("ln")))))
        .select(col("doc_id"), col("text"), col("bounds")))
    bounded
      .withColumn("chunks",
        when(size(col("bounds")) > 1,
          transform(sequence(lit(1), size(col("bounds")) - 1),
            k => struct(
              element_at(col("bounds"), k).as("start"),
              (element_at(col("bounds"), k + 1)
                - element_at(col("bounds"), k)).as("clen"))))
          .otherwise(array().cast("array<struct<start:bigint,clen:bigint>>")))
      .select(col("doc_id"), col("text"),
        posexplode(col("chunks")).as(Seq("ci", "ch")))
      .select(col("doc_id"),
        (col("ci") + 1).cast("long").as("chunk_idx"),
        col("ch.start").as("start"),
        col("ch.clen").as("chunk_len"),
        md5(expr("substr(text, ch.start + 1, ch.clen)")).as("chunk_md5"))
  }

  /** Chunk-level cross-document dedup over the CDC chunks: which
    * content spans recur across distinct documents (≥16 chars, ≥2
    * docs) — the readoff CDC chunking exists to enable, since its
    * boundaries re-synchronize across insert/delete edits and fixed
    * grids don't. Hash-grouped on the chunk digest: one shuffle of
    * (digest, doc) pairs, output bounded by the shared-span count.
    */
  val q_cdc_dedup: QueryDef = QueryDef(
    "q_cdc_dedup",
    s"""WITH $cdcCtes
       |SELECT chunk_md5, chunk_len,
       |  CAST(COUNT(*) AS BIGINT) AS n_occ,
       |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
       |FROM ch WHERE chunk_len >= 16
       |GROUP BY chunk_md5, chunk_len
       |HAVING COUNT(DISTINCT doc_id) >= 2
       |ORDER BY chunk_md5""".stripMargin) { (spark, dir) =>
    cdcChunkRows(Tables.documents(spark, dir))
      .filter(col("chunk_len") >= 16)
      .groupBy(col("chunk_md5"), col("chunk_len"))
      .agg(count(lit(1)).as("n_occ"),
        countDistinct(col("doc_id")).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .orderBy(col("chunk_md5"))
  }

  /** Purged k-fold temporal split with embargo (the leakage-safe CV
    * construction for label horizons): 3 contiguous day-folds; a train
    * row is PURGED when its 7-day label window [d, d+7) overlaps the
    * fold's test interval, and EMBARGOED when it falls in the 3 days
    * after test end (information leaking backward through serially
    * correlated features). Emits the per-fold account (n_test, n_train,
    * n_purged, n_embargoed) a training pipeline logs before it trusts
    * a temporal CV score. Scale posture: events reduce to the day grain
    * FIRST (one hash agg), then 3 broadcast fold rows classify ~nd
    * day-rows — the classification never touches row-sized data.
    */
  val q_purged_split = QueryDef(
    "q_purged_split",
    """WITH ev AS (
      |  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d FROM events),
      |bnd AS (SELECT MIN(d) AS d0,
      |  DATEDIFF('day', MIN(d), MAX(d)) + 1 AS nd FROM ev),
      |byday AS (SELECT d, COUNT(*) AS n FROM ev GROUP BY d),
      |folds AS (SELECT unnest(range(0, 3)) AS fold),
      |cls AS (
      |  SELECT f.fold,
      |    CASE
      |      WHEN di >= lo AND di < hi THEN 'test'
      |      WHEN di < hi AND di + 7 > lo THEN 'purged'
      |      WHEN di >= hi AND di < hi + 3 THEN 'embargoed'
      |      ELSE 'train' END AS cls, n
      |  FROM (SELECT b.d, b.n, DATEDIFF('day', d0, b.d) AS di, nd
      |        FROM byday b CROSS JOIN bnd) x
      |  CROSS JOIN (SELECT fold, (fold * (SELECT nd FROM bnd)) // 3 AS lo,
      |    ((fold + 1) * (SELECT nd FROM bnd)) // 3 AS hi FROM folds) f)
      |SELECT fold,
      |  CAST(COALESCE(SUM(CASE WHEN cls = 'test' THEN n END), 0) AS BIGINT) AS n_test,
      |  CAST(COALESCE(SUM(CASE WHEN cls = 'train' THEN n END), 0) AS BIGINT) AS n_train,
      |  CAST(COALESCE(SUM(CASE WHEN cls = 'purged' THEN n END), 0) AS BIGINT) AS n_purged,
      |  CAST(COALESCE(SUM(CASE WHEN cls = 'embargoed' THEN n END), 0) AS BIGINT) AS n_embargoed
      |FROM cls GROUP BY fold ORDER BY fold""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val ev = Tables.events(spark, dir).select(to_date(col("ts")).as("d"))
    val byday = ev.groupBy(col("d")).agg(count(lit(1)).as("n"))
    val bnd = ev.agg(min(col("d")).as("d0"),
      (datediff(max(col("d")), min(col("d"))) + 1).as("nd")).head()
    val (d0, nd) = (bnd.getDate(0), bnd.getInt(1))
    val folds = Seq(0L, 1L, 2L).map(f => (f, f * nd / 3, (f + 1) * nd / 3))
      .toDF("fold", "lo", "hi")
    val cls = byday
      .withColumn("di", datediff(col("d"), lit(d0)).cast("long"))
      .crossJoin(broadcast(folds))
      .withColumn("cls",
        when(col("di") >= col("lo") && col("di") < col("hi"), "test")
          .when(col("di") < col("hi") && col("di") + 7 > col("lo"), "purged")
          .when(col("di") >= col("hi") && col("di") < col("hi") + 3, "embargoed")
          .otherwise("train"))
    cls.groupBy(col("fold"))
      .agg(
        coalesce(sum(when(col("cls") === "test", col("n"))), lit(0L)).as("n_test"),
        coalesce(sum(when(col("cls") === "train", col("n"))), lit(0L)).as("n_train"),
        coalesce(sum(when(col("cls") === "purged", col("n"))), lit(0L)).as("n_purged"),
        coalesce(sum(when(col("cls") === "embargoed", col("n"))), lit(0L)).as("n_embargoed"))
      .orderBy(col("fold"))
  }

  /** Duplication-cluster size histogram: how many near-dup groups of
    * each size the corpus contains (singletons included) — the
    * one-glance duplication health chart built ON TOP of the certified
    * CC group labels (q_dedup_groups' oracle closure reused verbatim),
    * so the histogram inherits the transitive-grouping certification.
    * Two tiny re-aggregations after the group labels; output is
    * max-cluster-size-bounded.
    */
  val q_dup_cluster_sizes = QueryDef(
    "q_dup_cluster_sizes", {
      s"""WITH RECURSIVE ${DedupOps.minhashPairsSqlCtes(0.8)},
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL SELECT doc_b, doc_a FROM pairs),
         |nodes AS (SELECT DISTINCT src AS id FROM edges),
         |reach AS (
         |  SELECT id, id AS rid FROM nodes
         |  UNION
         |  SELECT r.id, e.dst AS rid FROM reach r JOIN edges e ON e.src = r.rid),
         |lbl AS (SELECT id, MIN(rid) AS grp FROM reach GROUP BY id),
         |g AS (
         |  SELECT COALESCE(l.grp, d.doc_id) AS grp
         |  FROM documents d LEFT JOIN lbl l ON l.id = d.doc_id),
         |sizes AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS c FROM g GROUP BY 1)
         |SELECT c AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(c) AS BIGINT) AS n_docs
         |FROM sizes GROUP BY 1 ORDER BY cluster_size""".stripMargin
    }) { (spark, dir) =>
    sharedDedupGroups(spark, dir)
      .groupBy(col("group_id")).agg(count(lit(1)).as("c"))
      .groupBy(col("c").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("c")).as("n_docs"))
      .orderBy(col("cluster_size"))
  }

  /** Dataset-card profile: the per-source / per-lang / marginal /
    * grand-total corpus statistics a dataset release documents, in ONE
    * pass via explicit GROUPING SETS (one Expand, four subtotal
    * levels; GROUPING() flags disambiguate subtotal NULLs). Mean via
    * exact integer floor division — no float summation anywhere.
    */
  val q_dataset_card = QueryDef(
    "q_dataset_card",
    """SELECT source, lang,
      |  CAST(GROUPING(source) AS BIGINT) AS g_source,
      |  CAST(GROUPING(lang) AS BIGINT) AS g_lang,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      |  CAST(SUM(n_chars) // COUNT(*) AS BIGINT) AS mean_chars,
      |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
      |FROM documents
      |GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
      |ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST"""
      .stripMargin) { (spark, dir) =>
    Tables.documents(spark, dir).createOrReplaceTempView("graft_docs_card")
    spark.sql(
      """SELECT source, lang,
        |  CAST(grouping(source) AS BIGINT) AS g_source,
        |  CAST(grouping(lang) AS BIGINT) AS g_lang,
        |  COUNT(*) AS n_docs,
        |  SUM(n_chars) AS total_chars,
        |  SUM(n_chars) div COUNT(*) AS mean_chars,
        |  MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
        |FROM graft_docs_card
        |GROUP BY GROUPING SETS ((source, lang), (source), (lang), ())
        |ORDER BY g_source, g_lang, source NULLS FIRST, lang NULLS FIRST"""
        .stripMargin)
  }

  /** Leave-one-out target encoding — the leakage-safe categorical
    * feature encoder (each row's encoding is the target mean over the
    * OTHER rows of its category, so a row never sees its own label;
    * the naive full-category mean leaks the target and inflates
    * validation scores, which is exactly the failure this operator
    * exists to prevent). Category = order priority, target =
    * order value in exact cents; loo = (Σcat − own) // (n_cat − 1),
    * with singleton categories falling back to the leave-one-out
    * GLOBAL mean. Shape: one map-side-combined aggregate to the
    * category table, broadcast back over the fact rows — two scans,
    * zero row-explosion, no window over the fact table; the integer
    * lattice (cents, floor division) keeps both engines bit-equal.
    */
  val q_target_encode = QueryDef(
    "q_target_encode",
    """WITH o AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |cat AS (
      |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cents) AS BIGINT) AS s
      |  FROM o GROUP BY 1),
      |tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS gn, CAST(SUM(cents) AS BIGINT) AS gs
      |  FROM o)
      |SELECT o.o_orderkey, o.o_orderpriority, o.cents,
      |  CASE WHEN c.n > 1 THEN (c.s - o.cents) // (c.n - 1)
      |       ELSE (g.gs - o.cents) // (g.gn - 1) END AS loo_cents
      |FROM o JOIN cat c ON c.o_orderpriority = o.o_orderpriority
      |CROSS JOIN tot g
      |ORDER BY o.o_orderkey""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val cat = o.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val glob = o.agg(count(lit(1)).as("gn"), sum(col("cents")).as("gs"))
    o.join(broadcast(cat), "o_orderpriority")
      .crossJoin(broadcast(glob))
      .select(col("o_orderkey"), col("o_orderpriority"), col("cents"),
        when(col("n") > 1, expr("(s - cents) DIV (n - 1)"))
          .otherwise(expr("(gs - cents) DIV (gn - 1)")).as("loo_cents"))
      .orderBy(col("o_orderkey"))
  }

  /** Temperature-tempered source mixing with EXACT budget allocation —
    * the T5/Pile-style α=0.5 multinomial re-weighting that upsamples
    * small sources without letting any source dominate: per-source
    * weight ∝ count^α, here α=1/2 so the tempering is `sqrt` — the one
    * transcendental that IEEE 754 requires correctly rounded, hence
    * bit-identical across Spark and DuckDB (no lookup-table workaround
    * needed). Weights move onto the integer micro lattice immediately
    * (`FLOOR(sqrt(n)·1e6+0.5)`), the 100k-document budget is allocated
    * by LARGEST-REMAINDER rounding (base = ⌊w·B/Σw⌋, the leftover units
    * go to the largest remainders, ties to source name) so the
    * allocations sum to the budget EXACTLY — the property a sampler
    * needs and naive per-source rounding loses — and per-source epochs
    * (allocation/count, in ppm — >1e6 means the source repeats) fall
    * out on the same lattice. Scale: one groupBy(source) aggregate;
    * everything after runs on the |sources|-row table (the single-
    * partition window is bounded by construction).
    */
  val q_mix_temperature = QueryDef(
    "q_mix_temperature",
    """WITH s AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM documents GROUP BY source),
      |w AS (
      |  SELECT source, n,
      |    CAST(FLOOR(sqrt(CAST(n AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS wm
      |  FROM s),
      |t AS (SELECT CAST(SUM(wm) AS BIGINT) AS tot FROM w),
      |b AS (
      |  SELECT source, n, wm,
      |    CAST(wm * 1000000 // tot AS BIGINT) AS weight_ppm,
      |    CAST(wm * 100000 // tot AS BIGINT) AS base,
      |    CAST(wm * 100000 % tot AS BIGINT) AS rem
      |  FROM w CROSS JOIN t),
      |l AS (SELECT 100000 - CAST(SUM(base) AS BIGINT) AS leftover FROM b),
      |r AS (SELECT *, ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
      |  FROM b)
      |SELECT source, n AS n_docs, weight_ppm,
      |  CAST(base + CASE WHEN rk <= (SELECT leftover FROM l)
      |    THEN 1 ELSE 0 END AS BIGINT) AS alloc,
      |  CAST((base + CASE WHEN rk <= (SELECT leftover FROM l)
      |    THEN 1 ELSE 0 END) * 1000000 // n AS BIGINT) AS epochs_ppm
      |FROM r ORDER BY source""".stripMargin) { (spark, dir) =>
    val budget = 100000L
    val s = Tables.documents(spark, dir)
      .groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("wm",
        floor(sqrt(col("n").cast("double")) * 1000000 + 0.5).cast("long"))
    val tot = broadcast(s.agg(sum(col("wm")).as("tot")))
    val b = s.crossJoin(tot)
      .select(col("source"), col("n"), col("wm"),
        expr("wm * 1000000 div tot").as("weight_ppm"),
        expr(s"wm * $budget div tot").as("base"),
        expr(s"wm * $budget % tot").as("rem"))
    val leftover = broadcast(b.agg((lit(budget) - sum(col("base"))).as("leftover")))
    // single-partition window is bounded: it runs on the per-source
    // aggregate (|sources| rows), never on document rows
    val rk = row_number().over(Window.orderBy(col("rem").desc, col("source")))
    val alloc = col("base") +
      when(col("rk") <= col("leftover"), lit(1L)).otherwise(lit(0L))
    b.withColumn("rk", rk).crossJoin(leftover)
      .withColumn("alloc", alloc)
      // exact integer div (not double `/` + cast: a quotient rounding
      // up to an integer would cross the floor the oracle computes)
      .select(col("source"), col("n").as("n_docs"), col("weight_ppm"),
        col("alloc"), expr("alloc * 1000000 div n").as("epochs_ppm"))
      .orderBy(col("source"))
  }

  /** Cross-source quantile calibration — the selection fix for mixing
    * heterogeneous sources: a RAW quality threshold lets the source
    * with the most generous score distribution dominate the kept set,
    * so instead each document's score (token count here — any
    * deterministic quality works) is converted to its WITHIN-SOURCE
    * quantile rank on the exact integer lattice
    * (`(rank−1)·1e6 // (n_source−1)` ppm, rank ties broken by doc_id),
    * and one global cut (top 20%) then keeps the same FRACTION of
    * every source by construction. Scale: one per-source window rank —
    * a single shuffle partitioned by source; the lattice keeps both
    * engines integer-exact (nonneg `div`/`//`).
    */
  val q_quality_calibrate = QueryDef(
    "q_quality_calibrate", {
      val ws = TextOps.wordsSql("text")
      s"""WITH s AS (
         |  SELECT doc_id, source, CAST(len($ws) AS BIGINT) AS n_tokens
         |  FROM documents),
         |r AS (
         |  SELECT doc_id, source, n_tokens,
         |    ROW_NUMBER() OVER (PARTITION BY source
         |      ORDER BY n_tokens, doc_id) AS rn,
         |    COUNT(*) OVER (PARTITION BY source) AS ns
         |  FROM s)
         |SELECT doc_id, source, n_tokens, calib_ppm FROM (
         |  SELECT doc_id, source, n_tokens,
         |    CAST((rn - 1) * 1000000 // (ns - 1) AS BIGINT) AS calib_ppm
         |  FROM r WHERE ns > 1) t
         |WHERE calib_ppm >= 800000
         |ORDER BY doc_id""".stripMargin
    }) { (spark, dir) =>
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens"), col("doc_id"))
    val cnt = Window.partitionBy(col("source"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        size(TextOps.words(col("text"))).cast("long").as("n_tokens"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("ns", count(lit(1)).over(cnt))
      .filter(col("ns") > 1)
      .withColumn("calib_ppm", expr("(rn - 1) * 1000000 div (ns - 1)"))
      .filter(col("calib_ppm") >= 800000L)
      .select(col("doc_id"), col("source"), col("n_tokens"), col("calib_ppm"))
      .orderBy(col("doc_id"))
  }

  /** Dedup threshold-sensitivity curve — the knob-tuning readout run
    * BEFORE committing a near-dup threshold corpus-wide: pairs scored
    * once at a low floor (0.3, the same certified MinHash→LSH→exact-
    * Jaccard pipeline), then a broadcast threshold grid counts, per
    * candidate cut, the surviving pairs and the documents involved —
    * "how much of the corpus does a 0.7 cut touch vs 0.8" as one scan
    * of the scored pairs, not one dedup run per threshold. Jaccard
    * moves to integer basis points before the comparison so the grid
    * filter is lattice-exact in both engines. Thresholds with zero
    * surviving pairs drop from the curve (inner join, both engines).
    */
  val q_dedup_threshold_curve = QueryDef(
    "q_dedup_threshold_curve", {
      val grid = (3 to 9).map(t => s"(${t * 1000})").mkString(", ")
      s"""WITH ${DedupOps.minhashScoredPairsSqlCtes(0.3)},
         |pb AS (
         |  SELECT doc_a, doc_b,
         |    CAST(FLOOR(jaccard * 10000 + 0.5) AS BIGINT) AS jbp
         |  FROM pairs),
         |grid(t) AS (VALUES $grid),
         |sel AS (SELECT t, doc_a, doc_b FROM grid JOIN pb ON jbp >= t),
         |np AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_pairs
         |  FROM sel GROUP BY t),
         |nd AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n_docs FROM (
         |    SELECT DISTINCT t, d FROM (
         |      SELECT t, doc_a AS d FROM sel
         |      UNION ALL SELECT t, doc_b FROM sel) u) v
         |  GROUP BY t)
         |SELECT CAST(np.t AS BIGINT) AS threshold_bp, n_pairs, n_docs
         |FROM np JOIN nd ON nd.t = np.t ORDER BY threshold_bp""".stripMargin
    }) { (spark, dir) =>
    import spark.implicits._
    val pairs = DedupOps.minhashNearDuplicates(
        Tables.documents(spark, dir), "doc_id", "text", 0.3)
      .withColumn("jbp", floor(col("jaccard") * 10000 + 0.5).cast("long"))
    val grid = broadcast(
      (3 to 9).map(t => t * 1000L).toDF("threshold_bp"))
    val sel = pairs.crossJoin(grid)
      .filter(col("jbp") >= col("threshold_bp"))
    val np = sel.groupBy(col("threshold_bp"))
      .agg(count(lit(1)).as("n_pairs"))
    val nd = sel.select(col("threshold_bp"), col("doc_a").as("d"))
      .unionByName(sel.select(col("threshold_bp"), col("doc_b").as("d")))
      .distinct()
      .groupBy(col("threshold_bp")).agg(count(lit(1)).as("n_docs"))
    np.join(nd, "threshold_bp").orderBy(col("threshold_bp"))
  }

  /** Deterministic per-epoch data ordering — training-reproducibility
    * as a certified operator: epoch e's permutation is the rank of the
    * scrambled hash h(doc_id, e) (Mersenne-mod multiply, reduced
    * BEFORE the multiply so both engines stay inside exact BIGINT),
    * so any worker can recompute any epoch's order with no stored
    * state and no RNG. The certified rank is the verification readout
    * of what is, at deploy scale, a distributed SORT by (h, doc_id)
    * (range-partitioned write order), not a single window — the
    * per-epoch window here runs at certification scale only.
    */
  val q_epoch_shuffle = QueryDef(
    "q_epoch_shuffle",
    """WITH e(epoch) AS (VALUES (0), (1), (2)),
      |h AS (
      |  SELECT epoch, doc_id,
      |    (((doc_id % 2147483647) * 2654435761) % 2147483647
      |      + epoch * 2246822519) % 2147483647 AS hv
      |  FROM documents CROSS JOIN e)
      |SELECT CAST(epoch AS BIGINT) AS epoch, doc_id,
      |  CAST(ROW_NUMBER() OVER (PARTITION BY epoch
      |    ORDER BY hv, doc_id) AS BIGINT) AS pos
      |FROM h ORDER BY epoch, pos""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val epochs = broadcast(Seq(0L, 1L, 2L).toDF("epoch"))
    val w = Window.partitionBy(col("epoch")).orderBy(col("hv"), col("doc_id"))
    Tables.documents(spark, dir).select(col("doc_id"))
      .crossJoin(epochs)
      .withColumn("hv",
        (pmod(pmod(col("doc_id"), lit(2147483647L)) * lit(2654435761L),
          lit(2147483647L)) + col("epoch") * lit(2246822519L))
          % lit(2147483647L))
      .select(col("epoch"), col("doc_id"),
        row_number().over(w).cast("long").as("pos"))
      .orderBy(col("epoch"), col("pos"))
  }

  /** [[q_epoch_shuffle]] in its DEPLOY-SCALE formulation — round-9
    * verdict item 6, closing the in-code caveat on T195: the per-epoch
    * window rank is replaced by [[graft.ops.EpochOps.epochOrderDistributed]]'s
    * range-partitioned sort + partition-offset splice (sampled
    * boundaries, no single-partition window anywhere; one bounded
    * ≤ partitions·epochs offsets collect). Certified against the SAME
    * window-rank oracle as q_epoch_shuffle, so the partitioning-
    * invariance of the positions — any worker count yields the exact
    * global permutation — is itself the certified contract.
    */
  val q_epoch_shuffle_dist = QueryDef(
    "q_epoch_shuffle_dist", q_epoch_shuffle.oracle.get) { (spark, dir) =>
    graft.ops.EpochOps.epochOrderDistributed(
      spark, Tables.documents(spark, dir).select(col("doc_id")),
      "doc_id", Seq(0L, 1L, 2L), numPartitions = 8)
      .select(col("epoch"), col("doc_id"), col("pos"))
      .orderBy(col("epoch"), col("pos"))
  }

  val all: Seq[QueryDef] = Seq(
    q_mix_temperature, q_quality_calibrate,
    q_dedup_threshold_curve, q_epoch_shuffle, q_epoch_shuffle_dist,
    q_target_encode,
    q_dedup_groups, q_dedup_groups_dist, q_stratified_sample, q_vocab_coverage,
    q_text_normalize, q_sequence_pack, q_pack_greedy, q_contamination, q_mix_rates,
    q_weighted_sample, q_lm_quality, q_dup_rate_by_source, q_source_overlap,
    q_hll_overlap, q_pii_scrub, q_soft_dedup_sample, q_bigram_lm,
    q_dataset_split, q_group_split, q_split_leakage, q_host_caps, q_doc_chunks,
    q_cdc_chunks, q_cdc_dedup, q_purged_split,
    q_canonical_docs, q_dataset_card, q_dup_cluster_sizes)
}
