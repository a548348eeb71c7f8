package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectation suite — the dbt-test / Great-Expectations
  * surface as ONE engine query: each check is a single-pass aggregate
  * that reports violations and population, union'd into a compact
  * audit report. The reference validates ingest row-by-row in Python
  * (`kafka_publisher.py` field precedence, `psql_db_client.py` insert
  * guards); here the same contracts run as declarative scans.
  *
  * Every check is violations-counting, never row-returning, so the
  * report is O(#checks) rows at any table size; the only join is the
  * referential-integrity probe, which at 100 TB is the dimension-
  * broadcast shape (the key set of the referenced dimension is the
  * small side).
  */
object DqQueries {

  private def check(name: String, table: String, df: DataFrame,
      violation: Column): DataFrame =
    df.agg(
      sum(when(violation, 1L).otherwise(0L)).as("n_violations"),
      count(lit(1)).as("n_checked"))
      .select(lit(name).as("check_name"), lit(table).as("table_name"),
        col("n_violations"), col("n_checked"))

  /** Six contract checks over four tables; `n_violations` must be 0 on
    * healthy testdata, and the oracle recomputes each check in SQL so
    * a broken check (not just broken data) also fails certification.
    */
  val q_dq_checks = QueryDef(
    "q_dq_checks",
    """SELECT 'doc_nchars_mismatch' AS check_name, 'documents' AS table_name,
      |  CAST(SUM(CASE WHEN text IS NULL OR n_chars <> length(text)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
      |  CAST(COUNT(*) AS BIGINT) AS n_checked
      |FROM documents
      |UNION ALL
      |SELECT 'dup_custkey', 'customer',
      |  CAST(COALESCE(SUM(CASE WHEN c > 1 THEN c END), 0) AS BIGINT),
      |  CAST(SUM(c) AS BIGINT)
      |FROM (SELECT COUNT(*) AS c FROM customer GROUP BY c_custkey) t
      |UNION ALL
      |SELECT 'lineitem_range', 'lineitem',
      |  CAST(SUM(CASE WHEN l_quantity < 1 OR l_quantity > 50
      |    OR l_discount < 0 OR l_discount > CAST(0.1 AS DOUBLE)
      |    OR l_tax < 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM lineitem
      |UNION ALL
      |SELECT 'nonpositive_order_price', 'orders',
      |  CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders
      |UNION ALL
      |SELECT 'null_event_fields', 'events',
      |  CAST(SUM(CASE WHEN value IS NULL OR user_id IS NULL OR ts IS NULL
      |    OR event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM events
      |UNION ALL
      |SELECT 'orphan_order_custkey', 'orders',
      |  CAST(COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS BIGINT),
      |  CAST(COUNT(*) AS BIGINT)
      |FROM orders o LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      |  ON o.o_custkey = c.c_custkey
      |ORDER BY check_name""".stripMargin) { (spark, dir) =>
    val docs = check("doc_nchars_mismatch", "documents",
      Tables.documents(spark, dir),
      col("text").isNull || col("n_chars") =!= length(col("text")))
    val custDups = Tables.customer(spark, dir)
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(when(col("c") > 1, col("c"))), lit(0L))
          .as("n_violations"),
        sum(col("c")).as("n_checked"))
      .select(lit("dup_custkey").as("check_name"),
        lit("customer").as("table_name"), col("n_violations"),
        col("n_checked"))
    val li = check("lineitem_range", "lineitem",
      Tables.lineitem(spark, dir),
      col("l_quantity") < 1 || col("l_quantity") > 50 ||
        col("l_discount") < 0 || col("l_discount") > 0.1 ||
        col("l_tax") < 0)
    val price = check("nonpositive_order_price", "orders",
      Tables.orders(spark, dir), col("o_totalprice") <= 0)
    val ev = check("null_event_fields", "events",
      Tables.events(spark, dir),
      col("value").isNull || col("user_id").isNull || col("ts").isNull ||
        col("event_type").isNull)
    val custKeys = Tables.customer(spark, dir)
      .select(col("c_custkey")).distinct()
    val orphans = check("orphan_order_custkey", "orders",
      Tables.orders(spark, dir)
        .join(broadcast(custKeys), col("o_custkey") === col("c_custkey"),
          "left"),
      col("c_custkey").isNull)
    docs.unionByName(custDups).unionByName(li).unionByName(price)
      .unionByName(ev).unionByName(orphans)
      .orderBy(col("check_name"))
  }

  /** k-anonymity audit over the quasi-identifier (event_type, day,
    * value tier): per type, how many equivalence classes fall below
    * k=5 and how many rows they hold — the privacy gate run before a
    * dataset release (suppress or generalize those rows). One
    * grouping pass + one rollup; class counts are exact integers.
    */
  val q_k_anonymity = QueryDef(
    "q_k_anonymity",
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(FLOOR(value / 50) AS BIGINT) AS value_tier,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(5 AS BIGINT) AS k,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS small_classes,
      |  CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
      |    AS rows_to_suppress,
      |  CAST(MIN(n) AS BIGINT) AS min_class_size
      |FROM q GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"),
        floor(col("value") / 50).cast("long").as("value_tier"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("small_classes"),
        sum(when(col("n") < 5, col("n")).otherwise(0L))
          .as("rows_to_suppress"),
        min(col("n")).as("min_class_size"))
      .select(col("event_type"), lit(5L).as("k"), col("n_classes"),
        col("small_classes"), col("rows_to_suppress"),
        col("min_class_size"))
      .orderBy(col("event_type"))
  }

  /** Benford first-significant-digit audit over `o_totalprice` — the
    * classic fabricated-numbers screen on a money column spanning
    * orders of magnitude. The digit is read from the exact cents
    * integer rendered as a string (leading digit is scale-invariant,
    * and BIGINT→string is exact in both engines — no log10 on doubles
    * near power-of-ten boundaries). Expected Benford shares are
    * hard-coded ppm literals (computing `log10(1+1/d)` on both engines
    * risks last-ulp drift through `FLOOR`); the chi-square contribution
    * is pure BIGINT lattice arithmetic, so the audit replays exactly.
    * One groupBy on a 9-value key + a 9-row window — any table size.
    */
  val q_benford = QueryDef(
    "q_benford",
    """WITH d AS (
      |  SELECT CAST(SUBSTR(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
      |      AS VARCHAR), 1, 1) AS BIGINT) AS first_digit
      |  FROM orders),
      |g AS (
      |  SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS total
      |  FROM d GROUP BY 1),
      |e AS (
      |  SELECT first_digit, n, (n * 1000000) // total AS obs_ppm,
      |    CASE first_digit WHEN 1 THEN 301030 WHEN 2 THEN 176091
      |      WHEN 3 THEN 124939 WHEN 4 THEN 96910 WHEN 5 THEN 79181
      |      WHEN 6 THEN 66947 WHEN 7 THEN 57992 WHEN 8 THEN 51153
      |      ELSE 45757 END AS exp_ppm
      |  FROM g)
      |SELECT first_digit, n, obs_ppm, CAST(exp_ppm AS BIGINT) AS exp_ppm,
      |  ((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) // exp_ppm
      |    AS chi2_contrib
      |FROM e ORDER BY first_digit""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val digits = Tables.orders(spark, dir)
      .select(substring(round(col("o_totalprice") * 100).cast("long")
        .cast("string"), 1, 1).cast("long").as("first_digit"))
      .groupBy(col("first_digit")).agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(
        Window.partitionBy().rowsBetween(
          Window.unboundedPreceding, Window.unboundedFollowing)))
    // hard-coded ppm shares of log10(1+1/d) — mirrored in the oracle CASE
    val expPpm = Seq(1 -> 301030L, 2 -> 176091L, 3 -> 124939L, 4 -> 96910L,
      5 -> 79181L, 6 -> 66947L, 7 -> 57992L, 8 -> 51153L)
      .foldLeft(lit(45757L)) { case (els, (d, ppm)) =>
        when(col("first_digit") === d, ppm).otherwise(els)
      }
    digits
      .withColumn("obs_ppm", expr("(n * 1000000) DIV total"))
      .withColumn("exp_ppm", expPpm)
      .select(col("first_digit"), col("n"), col("obs_ppm"), col("exp_ppm"),
        expr("((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) DIV exp_ppm")
          .as("chi2_contrib"))
      .orderBy(col("first_digit"))
  }

  /** Association strength between two categorical features (event_type
    * × hour-of-day) as an integer-lattice chi-square: the
    * feature-selection / drift-detection read ("is activity shape
    * type-dependent?") that a textbook mutual-information pass would
    * answer with cross-engine-fragile logarithms. Probabilities are
    * quantized FIRST (joint → ppm, marginals → per-mille, expected =
    * their product) and the squared-deviation ratio is BIGINT floor
    * division, so the statistic is a deterministic contract, not a
    * float race. Marginals come from windows over the cell table —
    * bounded by |types| × 24 rows regardless of event volume.
    */
  val q_assoc_chi2 = QueryDef(
    "q_assoc_chi2",
    """WITH cells AS (
      |  SELECT event_type,
      |    CAST(EXTRACT(HOUR FROM CAST(ts AS TIMESTAMP)) AS BIGINT) AS hour,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, hour, n,
      |    CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS r,
      |    CAST(SUM(n) OVER (PARTITION BY hour) AS BIGINT) AS c,
      |    CAST(SUM(n) OVER () AS BIGINT) AS tot
      |  FROM cells),
      |q AS (
      |  SELECT event_type, hour, n,
      |    (n * 1000000) // tot AS obs_ppm,
      |    ((r * 1000) // tot) * ((c * 1000) // tot) AS exp_ppm
      |  FROM m)
      |SELECT event_type, hour, n, exp_ppm,
      |  ((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm))
      |    // GREATEST(exp_ppm, 1) AS chi2_contrib
      |FROM q ORDER BY event_type, hour""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(spark, dir)
      .groupBy(col("event_type"), hour(col("ts")).cast("long").as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("r", sum(col("n")).over(Window.partitionBy("event_type")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("c", sum(col("n")).over(Window.partitionBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("tot", sum(col("n")).over(all))
      .withColumn("obs_ppm", expr("(n * 1000000) DIV tot"))
      .withColumn("exp_ppm", expr("((r * 1000) DIV tot) * ((c * 1000) DIV tot)"))
      .select(col("event_type"), col("hour"), col("n"), col("exp_ppm"),
        expr("((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm))" +
          " DIV GREATEST(exp_ppm, 1L)").as("chi2_contrib"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** l-diversity audit — the companion gate to [[q_k_anonymity]]: a
    * k-anonymous class is still linkable when every row in it shares
    * one sensitive value, so per quasi-identifier class (event_type,
    * day, value tier) we count DISTINCT sensitive values (user_id) and
    * roll up, per type, the classes below l=3 and the rows they expose.
    * Same single-grouping-pass shape as the k-audit; the distinct count
    * is per-class (bounded groups), never global.
    */
  val q_l_diversity = QueryDef(
    "q_l_diversity",
    """WITH q AS (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(FLOOR(value / 50) AS BIGINT) AS value_tier,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT user_id) AS BIGINT) AS l
      |  FROM events GROUP BY 1, 2, 3)
      |SELECT event_type, CAST(3 AS BIGINT) AS l_target,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(SUM(CASE WHEN l < 3 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS weak_classes,
      |  CAST(SUM(CASE WHEN l < 3 THEN n ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk,
      |  CAST(MIN(l) AS BIGINT) AS min_diversity
      |FROM q GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
    Tables.events(spark, dir)
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"),
        floor(col("value") / 50).cast("long").as("value_tier"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("l"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("l") < 3, 1L).otherwise(0L)).as("weak_classes"),
        sum(when(col("l") < 3, col("n")).otherwise(0L)).as("rows_at_risk"),
        min(col("l")).as("min_diversity"))
      .select(col("event_type"), lit(3L).as("l_target"), col("n_classes"),
        col("weak_classes"), col("rows_at_risk"), col("min_diversity"))
      .orderBy(col("event_type"))
  }

  /** t-closeness audit — the third privacy gate after [[q_k_anonymity]]
    * and [[q_l_diversity]]: a class can be k-anonymous AND l-diverse
    * while its sensitive-value DISTRIBUTION still leaks (every row in
    * the class skews rich, say). Per QI class (event_type, day, value
    * tier) we measure Earth-Mover's Distance between the class's
    * ordered sensitive-bucket distribution (spend cents in 20 fixed
    * buckets) and the event_type's global distribution — for ordered
    * equal-width buckets EMD is the mean |cumulative difference|, which
    * stays on the exact integer lattice by cross-multiplying the
    * unnormalized counts (d = n_cb·N_g − g_b·N_c) before the prefix
    * sum, then one floor division into ppm at the end. Absent buckets
    * still carry the running |cum| — the dense class×bucket grid is
    * what makes the prefix positions complete (classes × 20 rows,
    * bounded). Roll-up per type: worst class t, classes past t=0.2,
    * rows exposed. One grouping pass per grain; the grid join
    * broadcasts a 20-row bucket list.
    */
  val q_t_closeness = QueryDef(
    "q_t_closeness",
    """WITH ev AS MATERIALIZED (
      |  SELECT event_type,
      |    CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS DATE) AS day,
      |    CAST(FLOOR(value / 50) AS BIGINT) AS value_tier,
      |    GREATEST(LEAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) // 2500, 19), 0) AS b
      |  FROM events),
      |cls AS (SELECT event_type, day, value_tier,
      |    CAST(COUNT(*) AS BIGINT) AS nc
      |  FROM ev GROUP BY 1, 2, 3),
      |cell AS (SELECT event_type, day, value_tier, b,
      |    CAST(COUNT(*) AS BIGINT) AS ncb
      |  FROM ev GROUP BY 1, 2, 3, 4),
      |gl AS (SELECT event_type, b, CAST(COUNT(*) AS BIGINT) AS gb
      |  FROM ev GROUP BY 1, 2),
      |gtot AS (SELECT event_type, CAST(SUM(gb) AS BIGINT) AS ng
      |  FROM gl GROUP BY 1),
      |grid AS (
      |  SELECT c.event_type, c.day, c.value_tier, c.nc, t.ng, bs.b,
      |    COALESCE(ce.ncb, 0) AS ncb, COALESCE(g.gb, 0) AS gb
      |  FROM cls c
      |  JOIN gtot t USING (event_type)
      |  CROSS JOIN (SELECT unnest(range(0, 20)) AS b) bs
      |  LEFT JOIN cell ce USING (event_type, day, value_tier, b)
      |  LEFT JOIN gl g USING (event_type, b)),
      |cum AS (
      |  SELECT event_type, day, value_tier, nc, ng, b,
      |    SUM(ncb * ng - gb * nc) OVER (
      |      PARTITION BY event_type, day, value_tier
      |      ORDER BY b ROWS UNBOUNDED PRECEDING) AS cd
      |  FROM grid),
      |tcls AS (
      |  SELECT event_type, day, value_tier, nc,
      |    (SUM(ABS(cd)) * 1000000) // (nc * ng * 19) AS t_ppm
      |  FROM cum WHERE b < 19
      |  GROUP BY event_type, day, value_tier, nc, ng)
      |SELECT event_type,
      |  CAST(COUNT(*) AS BIGINT) AS n_classes,
      |  CAST(MAX(t_ppm) AS BIGINT) AS max_t_ppm,
      |  CAST(SUM(CASE WHEN t_ppm > 200000 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS weak_classes,
      |  CAST(SUM(CASE WHEN t_ppm > 200000 THEN nc ELSE 0 END) AS BIGINT)
      |    AS rows_at_risk
      |FROM tcls GROUP BY 1 ORDER BY event_type""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = graft.ops.Reuse.materialized(
      Tables.events(spark, dir).select(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"),
        floor(col("value") / 50).cast("long").as("value_tier"),
        // GREATEST clamp: Spark `div` truncates toward zero while the
        // oracle's `//` floors — they diverge on negative values (e.g.
        // -9999 div 2500 = -3 vs // = -4). Pinning the bucket to [0, 19]
        // on BOTH sides makes the lattice identical for any input sign.
        greatest(least(expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT) div 2500"),
          lit(19L)), lit(0L)).as("b")))
    val cls = ev.groupBy(col("event_type"), col("day"), col("value_tier"))
      .agg(count(lit(1)).as("nc"))
    val cell = ev.groupBy(col("event_type"), col("day"), col("value_tier"),
        col("b")).agg(count(lit(1)).as("ncb"))
    val glob = ev.groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("gb"))
    val gtot = glob.groupBy(col("event_type")).agg(sum(col("gb")).as("ng"))
    val buckets = spark.range(0, 20).select(col("id").as("b"))
    val grid = cls
      .join(gtot, Seq("event_type"))
      .crossJoin(broadcast(buckets))
      .join(cell, Seq("event_type", "day", "value_tier", "b"), "left")
      .join(glob, Seq("event_type", "b"), "left")
      .select(col("event_type"), col("day"), col("value_tier"),
        col("nc"), col("ng"), col("b"),
        coalesce(col("ncb"), lit(0L)).as("ncb"),
        coalesce(col("gb"), lit(0L)).as("gb"))
    val w = Window.partitionBy(col("event_type"), col("day"), col("value_tier"))
      .orderBy(col("b")).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tcls = grid
      .withColumn("cd", sum(col("ncb") * col("ng") - col("gb") * col("nc")).over(w))
      .filter(col("b") < 19)
      .groupBy(col("event_type"), col("day"), col("value_tier"),
        col("nc"), col("ng"))
      .agg(sum(abs(col("cd"))).as("sad"))
      .withColumn("t_ppm", expr("(sad * 1000000) DIV (nc * ng * 19)"))
    tcls.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_classes"),
        max(col("t_ppm")).as("max_t_ppm"),
        sum(when(col("t_ppm") > 200000, 1L).otherwise(0L)).as("weak_classes"),
        sum(when(col("t_ppm") > 200000, col("nc")).otherwise(0L)).as("rows_at_risk"))
      .orderBy(col("event_type"))
  }

  /** Cohen's kappa inter-rater agreement, per language, between two
    * deterministic document raters — the chance-corrected agreement
    * statistic every labeling/curation pipeline reports before
    * trusting annotations (raw agreement is inflated whenever tier
    * marginals are skewed; kappa subtracts the chance floor). Rater A
    * tiers by total characters, rater B by whitespace count (a word
    * proxy): correlated for spaced scripts, structurally divergent
    * for zh — so the per-lang kappas are genuinely heterogeneous.
    * Same integer-lattice policy as [[q_assoc_chi2]]: observed
    * agreement in ppm, expected agreement as a sum of per-mille
    * marginal products, kappa = (po−pe)·10⁶ // (10⁶−pe) — pure BIGINT
    * arithmetic, one groupBy over (lang), counts map-side combined.
    */
  val q_cohens_kappa = QueryDef(
    "q_cohens_kappa",
    """WITH t AS (
      |  SELECT lang,
      |    CASE WHEN n_chars < 300 THEN 0 WHEN n_chars < 600 THEN 1
      |      ELSE 2 END AS a,
      |    CASE WHEN length(text) - length(replace(text, ' ', '')) < 50
      |      THEN 0
      |      WHEN length(text) - length(replace(text, ' ', '')) < 100
      |      THEN 1 ELSE 2 END AS b
      |  FROM documents),
      |m AS (
      |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS tot,
      |    CAST(SUM(CASE WHEN a = b THEN 1 ELSE 0 END) AS BIGINT) AS agree,
      |    CAST(SUM(CASE WHEN a = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ra0,
      |    CAST(SUM(CASE WHEN a = 1 THEN 1 ELSE 0 END) AS BIGINT) AS ra1,
      |    CAST(SUM(CASE WHEN a = 2 THEN 1 ELSE 0 END) AS BIGINT) AS ra2,
      |    CAST(SUM(CASE WHEN b = 0 THEN 1 ELSE 0 END) AS BIGINT) AS rb0,
      |    CAST(SUM(CASE WHEN b = 1 THEN 1 ELSE 0 END) AS BIGINT) AS rb1,
      |    CAST(SUM(CASE WHEN b = 2 THEN 1 ELSE 0 END) AS BIGINT) AS rb2
      |  FROM t GROUP BY lang),
      |q AS (
      |  SELECT lang, tot, (agree * 1000000) // tot AS po_ppm,
      |    ((ra0 * 1000) // tot) * ((rb0 * 1000) // tot)
      |      + ((ra1 * 1000) // tot) * ((rb1 * 1000) // tot)
      |      + ((ra2 * 1000) // tot) * ((rb2 * 1000) // tot) AS pe_ppm
      |  FROM m)
      |SELECT lang, CAST(tot AS BIGINT) AS n_docs,
      |  CAST(po_ppm AS BIGINT) AS po_ppm, CAST(pe_ppm AS BIGINT) AS pe_ppm,
      |  CAST(((po_ppm - pe_ppm) * 1000000)
      |    // GREATEST(1000000 - pe_ppm, 1) AS BIGINT) AS kappa_ppm
      |FROM q ORDER BY lang""".stripMargin) { (spark, dir) =>
    val spaces = length(col("text")) - length(regexp_replace(col("text"), " ", ""))
    val tiers = Tables.documents(spark, dir).select(col("lang"),
      when(col("n_chars") < 300, 0L).when(col("n_chars") < 600, 1L)
        .otherwise(2L).as("a"),
      when(spaces < 50, 0L).when(spaces < 100, 1L).otherwise(2L).as("b"))
    def cnt(c: Column): Column = sum(when(c, 1L).otherwise(0L))
    tiers.groupBy(col("lang"))
      .agg(count(lit(1)).as("tot"),
        cnt(col("a") === col("b")).as("agree"),
        cnt(col("a") === 0).as("ra0"), cnt(col("a") === 1).as("ra1"),
        cnt(col("a") === 2).as("ra2"),
        cnt(col("b") === 0).as("rb0"), cnt(col("b") === 1).as("rb1"),
        cnt(col("b") === 2).as("rb2"))
      .select(col("lang"), col("tot"),
        expr("(agree * 1000000) DIV tot").as("po_ppm"),
        expr("((ra0 * 1000) DIV tot) * ((rb0 * 1000) DIV tot)" +
          " + ((ra1 * 1000) DIV tot) * ((rb1 * 1000) DIV tot)" +
          " + ((ra2 * 1000) DIV tot) * ((rb2 * 1000) DIV tot)").as("pe_ppm"))
      .select(col("lang"), col("tot").as("n_docs"), col("po_ppm"),
        col("pe_ppm"),
        expr("((po_ppm - pe_ppm) * 1000000)" +
          " DIV GREATEST(1000000 - pe_ppm, 1L)").as("kappa_ppm"))
      .orderBy(col("lang"))
  }

  /** Two-sample Kolmogorov–Smirnov distance between the `value`
    * distributions of two event types — the standard distribution-
    * drift test (is "purchase" value-shaped like "click"?), computed
    * EXACTLY on the integer lattice: values quantize to cents, the
    * ECDF difference is |⌊ca·10⁶/n₁⌋ − ⌊cb·10⁶/n₂⌋| in ppm, and the
    * report row carries D plus the location where the gap peaks (min
    * cents on ties — deterministic). Scale posture: the raw events
    * reduce FIRST (one map-side-combined groupBy on cents), and the
    * cumulative window runs over the AGGREGATED distribution — its
    * single-partition sort is bounded by the value grid's cardinality,
    * not the event count, which is how an exact global ECDF stays
    * feasible at 100 TB (quantization IS the compaction).
    */
  val q_ks_test = QueryDef(
    "q_ks_test",
    """WITH s AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |g AS (
      |  SELECT cents,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b
      |  FROM s GROUP BY cents),
      |c AS (
      |  SELECT cents,
      |    CAST(SUM(a) OVER (ORDER BY cents) AS BIGINT) AS ca,
      |    CAST(SUM(b) OVER (ORDER BY cents) AS BIGINT) AS cb,
      |    CAST(SUM(a) OVER () AS BIGINT) AS n1,
      |    CAST(SUM(b) OVER () AS BIGINT) AS n2
      |  FROM g),
      |d AS (
      |  SELECT cents,
      |    ABS((ca * 1000000) // n1 - (cb * 1000000) // n2) AS dv, n1, n2
      |  FROM c),
      |m AS (SELECT MAX(dv) AS mx FROM d)
      |SELECT d.n1 AS n_a, d.n2 AS n_b, CAST(m.mx AS BIGINT) AS d_ppm,
      |  CAST(MIN(d.cents) AS BIGINT) AS at_cents
      |FROM d CROSS JOIN m WHERE d.dv = m.mx
      |GROUP BY d.n1, d.n2, m.mx""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val s = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val g = s.groupBy(col("cents"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
    ksReadoff(g)
  }

  /** KS read-off over an aggregated (cents, a, b) distribution table —
    * shared by [[q_ks_test]] (batch-built distribution) and the
    * streaming q_stream_ks (micro-batch-accumulated distribution):
    * per-cents counts are a plain mergeable SUM, so the same read-off
    * over either build must produce the same statistic. The cumulative
    * windows run over the AGGREGATED grid (bounded cardinality), never
    * raw events.
    */
  def ksReadoff(g: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cum = Window.orderBy(col("cents"))
    val all = Window.partitionBy().rowsBetween(
      Window.unboundedPreceding, Window.unboundedFollowing)
    val d = g.select(col("cents"),
        sum(col("a")).over(cum).as("ca"), sum(col("b")).over(cum).as("cb"),
        sum(col("a")).over(all).as("n1"), sum(col("b")).over(all).as("n2"))
      .select(col("cents"),
        abs(expr("(ca * 1000000) DIV n1 - (cb * 1000000) DIV n2")).as("dv"),
        col("n1"), col("n2"))
    d.crossJoin(broadcast(d.agg(max(col("dv")).as("mx"))))
      .filter(col("dv") === col("mx"))
      .groupBy(col("n1"), col("n2"), col("mx"))
      .agg(min(col("cents")).as("at_cents"))
      .select(col("n1").as("n_a"), col("n2").as("n_b"),
        col("mx").as("d_ppm"), col("at_cents"))
  }

  /** Gini coefficient of revenue concentration per nation — the
    * Lorenz-curve inequality audit ("is this market a few whales or a
    * broad base?") that flags concentration risk before a contract
    * renegotiation or a sampling design trusts per-customer averages.
    * Zero-revenue customers are INCLUDED (left join; a nation where
    * most customers never order is maximally concentrated — dropping
    * them would hide exactly the signal). Exact integer lattice: cents
    * revenue, ranks by (cents, custkey) inside each nation partition
    * (parallel across nations — no global sort), and the closed form
    * G = (2·Σi·xᵢ − (n+1)·Σx) / (n·Σx) in ppm. The ppm scaling is a
    * STAGED exact division (⌊num·10⁶/den⌋ as q·10⁶ + digit-split
    * remainders) because num·10⁶ overflows BIGINT at sf0.1 revenue
    * volumes while num and den themselves fit comfortably — the
    * identity ⌊a·10⁶/D⌋ = ⌊a·10³/D⌋·10³ + ⌊((a·10³) mod D)·10³/D⌋
    * keeps every intermediate ≤ den·10³. (Caught by the 3-SF sweep:
    * sf0.01 passed, sf0.1 threw ARITHMETIC_OVERFLOW.)
    */
  val q_gini_concentration = QueryDef(
    "q_gini_concentration",
    """WITH rev AS (
      |  SELECT c.c_custkey, c.c_nationkey,
      |    CAST(COALESCE(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5)
      |      AS BIGINT)), 0) AS BIGINT) AS cents
      |  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      |  GROUP BY 1, 2),
      |r AS (
      |  SELECT c_nationkey, cents,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
      |      ORDER BY cents, c_custkey) AS BIGINT) AS i
      |  FROM rev),
      |g AS (
      |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cents) AS BIGINT) AS s0,
      |    CAST(SUM(i * cents) AS BIGINT) AS s1
      |  FROM r GROUP BY 1),
      |d AS (
      |  SELECT c_nationkey, n, s0,
      |    2 * s1 - (n + 1) * s0 AS num,
      |    GREATEST(n * s0, 1) AS den
      |  FROM g)
      |SELECT n2.n_name AS nation, d.n AS n_customers, d.s0 AS total_cents,
      |  CAST((d.num // d.den) * 1000000
      |    + ((d.num % d.den) * 1000 // d.den) * 1000
      |    + (((d.num % d.den) * 1000 % d.den) * 1000) // d.den
      |    AS BIGINT) AS gini_ppm
      |FROM d JOIN nation n2 ON n2.n_nationkey = d.c_nationkey
      |ORDER BY nation""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val rev = Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir),
        col("o_custkey") === col("c_custkey"), "left")
      .groupBy(col("c_custkey"), col("c_nationkey"))
      .agg(coalesce(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")),
        lit(0L)).as("cents"))
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("cents"), col("c_custkey"))
    rev
      .withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s0"),
        sum(col("i") * col("cents")).as("s1"))
      .withColumn("num", expr("2 * s1 - (n + 1) * s0"))
      .withColumn("den", expr("GREATEST(n * s0, 1L)"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("n_nationkey") === col("c_nationkey"))
      .select(col("n_name").as("nation"), col("n").as("n_customers"),
        col("s0").as("total_cents"),
        expr("(num DIV den) * 1000000" +
          " + ((num % den) * 1000 DIV den) * 1000" +
          " + (((num % den) * 1000 % den) * 1000) DIV den").as("gini_ppm"))
      .orderBy(col("nation"))
  }

  /** Exact tie-corrected Mann–Whitney U between the `value`
    * distributions of two event types — the RANK-based companion to
    * [[q_ks_test]]'s ECDF distance: KS asks "do the shapes differ
    * anywhere", U asks "does one population stochastically dominate",
    * which is the right question for a median-shift drift (and the
    * nonparametric justification behind A/B readouts on skewed value
    * data). Everything stays on the integer lattice: values quantize
    * to cents; tied groups use DOUBLED midranks (`2·c_before + t + 1`
    * — integer, no .5), so `u2_a = 2·U_a` is exact; the
    * common-language effect size `U_a/(n_a·n_b)` reports in ppm by
    * integer division, and the tie-correction term `Σ(t³−t)` (what a
    * z-approximation divides out of the variance) is an exact BIGINT.
    * Scale posture identical to KS: raw events reduce FIRST to the
    * per-cents (a, b) grid, and the single cumulative window runs
    * over the bounded value grid, never the event stream.
    */
  val q_mannwhitney = QueryDef(
    "q_mannwhitney",
    """WITH s AS (
      |  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type IN ('click', 'purchase')),
      |g AS (
      |  SELECT cents,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS a,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS b
      |  FROM s GROUP BY cents),
      |c AS (
      |  SELECT a, b, a + b AS t,
      |    SUM(a + b) OVER (ORDER BY cents) - (a + b) AS c_before
      |  FROM g),
      |m AS (
      |  SELECT CAST(SUM(a) AS BIGINT) AS n_a, CAST(SUM(b) AS BIGINT) AS n_b,
      |    CAST(SUM(a * (2 * c_before + t + 1)) AS BIGINT) AS r2a,
      |    CAST(SUM(t * t * t - t) AS BIGINT) AS tie_cube
      |  FROM c)
      |SELECT n_a, n_b,
      |  r2a - n_a * (n_a + 1) AS u2_a,
      |  2 * n_a * n_b - (r2a - n_a * (n_a + 1)) AS u2_b,
      |  ((r2a - n_a * (n_a + 1)) * 1000000) // (2 * n_a * n_b) AS cle_ppm,
      |  tie_cube
      |FROM m""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val s = Tables.events(spark, dir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
    val g = s.groupBy(col("cents"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("b"))
    val cum = Window.orderBy(col("cents"))
    val c = g.select(col("a"), col("b"), (col("a") + col("b")).as("t"),
      (sum(col("a") + col("b")).over(cum) - (col("a") + col("b")))
        .as("c_before"))
    c.agg(sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
        sum(col("a") * (lit(2) * col("c_before") + col("t") + 1)).as("r2a"),
        sum(col("t") * col("t") * col("t") - col("t")).as("tie_cube"))
      .select(col("n_a"), col("n_b"),
        (col("r2a") - col("n_a") * (col("n_a") + 1)).as("u2_a"),
        (lit(2) * col("n_a") * col("n_b")
          - (col("r2a") - col("n_a") * (col("n_a") + 1))).as("u2_b"),
        expr("((r2a - n_a * (n_a + 1)) * 1000000) DIV (2 * n_a * n_b)")
          .as("cle_ppm"),
        col("tie_cube"))
  }

  /** Isotonic (PAV) calibration curve: does early activity predict
    * retention MONOTONICALLY, and what is the calibrated probability
    * per activity band? Score = events in the first 14 days, label =
    * any event in the last 14; scores bin to ≤20 bands and the
    * isotonic fit is computed by the pool-adjacent-violators CLOSED
    * FORM fit(i) = max_{j≤i} min_{k≥i} mean(y[j..k]) over the BINNED
    * aggregates — segment means come from prefix sums, so the whole
    * fit is B² integer-lattice rows (B ≤ 20), exact in ppm by floor
    * division, and embarrassingly parallel. Scale posture: the raw
    * events reduce to per-user (score, label) with two hash aggs,
    * then to the B-row bin table — the minimax never touches anything
    * data-sized, which is what makes exact PAV feasible at 100 TB
    * (the reduction IS the algorithm; a sequential pool walk would
    * serialize on the driver for no benefit at this cardinality).
    * This is the calibration audit a quality-classifier's scores get
    * before the pipeline trusts them as probabilities.
    */
  val q_isotonic = QueryDef(
    "q_isotonic",
    """WITH ev AS (
      |  SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d,
      |    event_type, value
      |  FROM events),
      |bounds AS (SELECT MIN(d) AS t0, MAX(d) AS tmax FROM ev),
      |per AS (
      |  SELECT user_id,
      |    CAST(SUM(CASE WHEN event_type = 'click'
      |      AND date_diff('day', t0, d) < 14 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS score,
      |    CAST(MAX(CASE WHEN event_type = 'purchase' AND value > 50
      |      AND date_diff('day', d, tmax) < 14 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS pos
      |  FROM ev CROSS JOIN bounds GROUP BY 1),
      |g AS (
      |  SELECT LEAST(score, 19) AS b, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pos) AS BIGINT) AS pos
      |  FROM per GROUP BY 1),
      |cum AS (
      |  SELECT ROW_NUMBER() OVER (ORDER BY b) AS rn, b, n, pos,
      |    CAST(SUM(n) OVER (ORDER BY b) AS BIGINT) AS cn,
      |    CAST(SUM(pos) OVER (ORDER BY b) AS BIGINT) AS cp
      |  FROM g),
      |cum0 AS (
      |  SELECT CAST(0 AS BIGINT) AS rn, CAST(0 AS BIGINT) AS cn,
      |    CAST(0 AS BIGINT) AS cp
      |  UNION ALL SELECT rn, cn, cp FROM cum),
      |seg AS (
      |  SELECT l.rn AS l, k.rn AS k,
      |    ((k.cp - l.cp) * 1000000) // (k.cn - l.cn) AS rate
      |  FROM cum0 l JOIN cum k ON l.rn < k.rn),
      |mm AS (
      |  SELECT c.rn AS i, c.b, c.n, c.pos, s.l, MIN(s.rate) AS minr
      |  FROM cum c JOIN seg s ON s.l < c.rn AND s.k >= c.rn
      |  GROUP BY 1, 2, 3, 4, 5)
      |SELECT b AS bin, n AS n_users, pos AS n_pos,
      |  (pos * 1000000) // n AS raw_ppm,
      |  CAST(MAX(minr) AS BIGINT) AS iso_ppm
      |FROM mm GROUP BY 1, 2, 3, 4
      |ORDER BY bin""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    val ev = graft.ops.Reuse.materialized(
      Tables.events(spark, dir)
        .select(col("user_id"), to_date(col("ts")).as("d"),
          col("event_type"), col("value")))
    val bounds = ev.agg(min(col("d")).as("t0"), max(col("d")).as("tmax"))
    // ONE grouped pass builds (score, label) per user — every user has
    // events, so no outer-join scaffolding is needed
    val per = ev.crossJoin(broadcast(bounds))
      .groupBy(col("user_id"))
      .agg(
        sum(when(col("event_type") === "click"
          && datediff(col("d"), col("t0")) < 14, 1L).otherwise(0L))
          .as("score"),
        max(when(col("event_type") === "purchase" && col("value") > 50
          && datediff(col("tmax"), col("d")) < 14, 1L).otherwise(0L))
          .as("pos"))
    val g = per.groupBy(least(col("score"), lit(19L)).as("b"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("pos"))
    // everything below is over the ≤20-row bin table — the bounded
    // single-partition window is the same posture as ksReadoff
    val wc = Window.orderBy(col("b"))
    val cum = graft.ops.Reuse.materialized(
      g.select(row_number().over(wc).cast("long").as("rn"),
        col("b"), col("n"), col("pos"),
        sum(col("n")).over(wc).as("cn"), sum(col("pos")).over(wc).as("cp")))
    val cum0 = cum.select(col("rn"), col("cn"), col("cp"))
      .unionByName(spark.range(1).select(lit(0L).as("rn"),
        lit(0L).as("cn"), lit(0L).as("cp")))
    val seg = cum0.select(col("rn").as("l"), col("cn").as("cnl"),
        col("cp").as("cpl"))
      .join(broadcast(cum.select(col("rn").as("k"), col("cn").as("cnk"),
        col("cp").as("cpk"))), col("l") < col("k"))
      .select(col("l"), col("k"),
        expr("((cpk - cpl) * 1000000) DIV (cnk - cnl)").as("rate"))
    cum.select(col("rn").as("i"), col("b"), col("n"), col("pos"))
      .join(broadcast(seg), col("l") < col("i") && col("k") >= col("i"))
      .groupBy(col("i"), col("b"), col("n"), col("pos"), col("l"))
      .agg(min(col("rate")).as("minr"))
      .groupBy(col("i"), col("b"), col("n"), col("pos"))
      .agg(max(col("minr")).as("iso_ppm"))
      .select(col("b").as("bin"), col("n").as("n_users"),
        col("pos").as("n_pos"),
        expr("(pos * 1000000) DIV n").as("raw_ppm"), col("iso_ppm"))
      .orderBy(col("bin"))
  }

  val all: Seq[QueryDef] =
    Seq(q_dq_checks, q_k_anonymity, q_benford, q_assoc_chi2, q_l_diversity,
      q_t_closeness,
      q_cohens_kappa, q_ks_test, q_mannwhitney, q_isotonic,
      q_gini_concentration)
}
