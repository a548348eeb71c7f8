package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator inventory (SURVEY.md §2.2–§2.7) re-expressed over
  * the TPC-H-ish test tables. Each query mirrors the semantics of a
  * reference operator (cited per query) in idiomatic declarative Spark:
  * Catalyst gets full visibility (pushdown, pruning, broadcast
  * selection) and every plan survives a 100× scale-up — dimension joins
  * are broadcast, fact-fact joins shuffle on their keys, top-k compiles
  * to TakeOrderedAndProject (no global sort).
  *
  * Every double output is rounded in BOTH the Spark code and the oracle
  * SQL so the driver's hash compare is not FP-order sensitive.
  */
object Relational {

  /** Pricing summary — grouped multi-aggregate with array-free measures.
    * Mirrors daily-counts aggregates (reference `anomaly_detection.py:12-22`,
    * `psql_db_client.py:194-209`): groupBy low-cardinality keys, partial+final
    * HashAggregate around one 2-key shuffle. */
  val q_pricing_summary = QueryDef(
    "q_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
      |  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
      |  ROUND(AVG(l_quantity), 4) AS avg_qty,
      |  ROUND(AVG(l_discount), 4) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("2000-12-01 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Top-N frequency — `ORDER BY count DESC LIMIT n` with deterministic
    * tiebreak; plans as TakeOrderedAndProject, never a global sort.
    * Mirrors top-10 diseases/symptoms (`app_upgraded.py:80-90`,
    * `psql_db_client.py:488-496`). */
  val q_top_parts = QueryDef(
    "q_top_parts",
    """SELECT l_partkey, COUNT(*) AS n_lines,
      |  ROUND(SUM(l_quantity), 2) AS total_qty
      |FROM lineitem GROUP BY l_partkey
      |ORDER BY n_lines DESC, l_partkey ASC LIMIT 10""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"), round(sum("l_quantity"), 2).as("total_qty"))
      .orderBy(col("n_lines").desc, col("l_partkey").asc)
      .limit(10)
  }

  /** Simple group counts ordered by frequency — mirrors borough/severity/
    * source distributions (`app_upgraded.py:102-111,198-209`). */
  val q_priority_counts = QueryDef(
    "q_priority_counts",
    """SELECT o_orderpriority, COUNT(*) AS n,
      |  ROUND(SUM(o_totalprice), 2) AS total_price
      |FROM orders GROUP BY o_orderpriority
      |ORDER BY n DESC, o_orderpriority""".stripMargin) { (spark, dir) =>
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy(col("n").desc, col("o_orderpriority"))
  }

  /** Star join: fact→dim→dim with small dims broadcast (reference's
    * borough/neighborhood lookup joins J2–J6, `nyc_neighborhoods.py:176-217`).
    * nation/region are tiny at every SF → explicit broadcast() so the
    * plan stays shuffle-free on the dimension side at 100 TB. */
  val q_customer_by_region = QueryDef(
    "q_customer_by_region",
    """SELECT r.r_name, COUNT(*) AS n_customers,
      |  ROUND(SUM(c.c_acctbal), 2) AS total_acctbal
      |FROM customer c
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name
      |ORDER BY r.r_name""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(count(lit(1)).as("n_customers"), round(sum("c_acctbal"), 2).as("total_acctbal"))
      .orderBy(col("r_name"))
  }

  /** Fact-fact equi-join + aggregate: revenue per priority for one order
    * year. Both sides large at scale → shuffle join on the key; the date
    * filter is pushed into the orders parquet scan so only matching
    * row-groups are read. Mirrors official-vs-informal join J1 shape
    * (`app_upgraded.py:599-604`). */
  val q_revenue_by_priority = QueryDef(
    "q_revenue_by_priority",
    """SELECT o.o_orderpriority,
      |  COUNT(DISTINCT o.o_orderkey) AS n_orders,
      |  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY o.o_orderpriority
      |ORDER BY o.o_orderpriority""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_orderkey")).as("n_orders"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("revenue"))
      .orderBy(col("o_orderpriority"))
  }

  /** Left-anti join — "ids not already present" (reference vector-store
    * skip-existing J7, `chromadb_client.py:78-96`). */
  val q_customers_no_orders = QueryDef(
    "q_customers_no_orders",
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .join(Tables.orders(spark, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Left-semi join — EXISTS rewrite (reference array-overlap semi-join P5,
    * `spatial_clustering.py:176-178`). */
  val q_parts_shipped_1999 = QueryDef(
    "q_parts_shipped_1999",
    """SELECT p_partkey, p_name FROM part p
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey
      |    AND l.l_shipdate >= TIMESTAMP '1999-01-01 00:00:00'
      |    AND l.l_shipdate < TIMESTAMP '1999-04-01 00:00:00')
      |ORDER BY p_partkey""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1999-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1999-04-01").cast("timestamp"))
    Tables.part(spark, dir)
      .join(li, col("p_partkey") === col("l_partkey"), "left_semi")
      .select(col("p_partkey"), col("p_name"))
      .orderBy(col("p_partkey"))
  }

  /** Theta/range join against a literal tier dimension — the reference's
    * point-in-bounding-box lookup J2 (`nyc_neighborhoods.py:190-205`):
    * broadcast the tiny range table, non-equi predicate, left join. */
  val q_price_tiers = QueryDef(
    "q_price_tiers",
    """WITH tiers(tier, lo, hi) AS (
      |  VALUES ('budget', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
      |         ('premium', 150000.0, 500000.0))
      |SELECT t.tier, COUNT(*) AS n_orders,
      |  ROUND(SUM(o.o_totalprice), 2) AS total_price
      |FROM orders o JOIN tiers t ON o.o_totalprice >= t.lo AND o.o_totalprice < t.hi
      |GROUP BY t.tier ORDER BY t.tier""".stripMargin) { (spark, dir) =>
    import spark.implicits._
    val tiers = Seq(
      ("budget", 0.0, 50000.0), ("mid", 50000.0, 150000.0),
      ("premium", 150000.0, 500000.0)).toDF("tier", "lo", "hi")
    Tables.orders(spark, dir)
      .join(broadcast(tiers), col("o_totalprice") >= col("lo") && col("o_totalprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_orders"), round(sum("o_totalprice"), 2).as("total_price"))
      .orderBy(col("tier"))
  }

  /** CASE WHEN relabel + custom severity ordering (reference
    * `app_upgraded.py:129-144`): order by a when-ladder rank, not
    * lexicographically. */
  val q_order_size_classes = QueryDef(
    "q_order_size_classes",
    """SELECT CASE WHEN o_totalprice >= 300000 THEN 'large'
      |            WHEN o_totalprice >= 100000 THEN 'medium'
      |            ELSE 'small' END AS size_class,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1
      |ORDER BY CASE size_class WHEN 'large' THEN 1 WHEN 'medium' THEN 2 ELSE 3 END""".stripMargin) { (spark, dir) =>
    val cls = when(col("o_totalprice") >= 300000, "large")
      .when(col("o_totalprice") >= 100000, "medium")
      .otherwise("small")
    Tables.orders(spark, dir)
      .groupBy(cls.as("size_class"))
      .agg(count(lit(1)).as("n"))
      .orderBy(when(col("size_class") === "large", 1)
        .when(col("size_class") === "medium", 2).otherwise(3))
  }

  /** Grouped min/max/corr/stddev statistics panel — A7 (`psql_db_client.py:
    * 499-503`), A17 correlation (`app_upgraded.py:614-615`). */
  val q_lineitem_stats = QueryDef(
    "q_lineitem_stats",
    """SELECT l_returnflag,
      |  ROUND(MIN(l_extendedprice), 2) AS min_price,
      |  ROUND(MAX(l_extendedprice), 2) AS max_price,
      |  ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
      |  ROUND(CORR(l_quantity, l_extendedprice), 4) AS qty_price_corr
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        round(min("l_extendedprice"), 2).as("min_price"),
        round(max("l_extendedprice"), 2).as("max_price"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_corr"))
      .orderBy(col("l_returnflag"))
  }

  /** Distinct counts — A8 (`app_upgraded.py:319-320`). Exact here;
    * at 100 TB the same query ships as approx_count_distinct (HLL). */
  val q_distinct_parts_per_status = QueryDef(
    "q_distinct_parts_per_status",
    """SELECT l_linestatus, COUNT(DISTINCT l_partkey) AS n_parts,
      |  COUNT(DISTINCT l_suppkey) AS n_supps
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin) { (spark, dir) =>
    Tables.lineitem(spark, dir)
      .groupBy(col("l_linestatus"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))
      .orderBy(col("l_linestatus"))
  }

  /** Union + distinct over two normalized subsets — U2
    * (`app_upgraded.py:393-395`). */
  val q_key_accounts_union = QueryDef(
    "q_key_accounts_union",
    """SELECT * FROM (
      |  SELECT c_custkey AS acct_key, 'customer' AS kind FROM customer WHERE c_acctbal > 9000
      |  UNION
      |  SELECT s_suppkey AS acct_key, 'supplier' AS kind FROM supplier WHERE s_acctbal > 5000
      |) ORDER BY kind, acct_key""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).filter(col("c_acctbal") > 9000)
      .select(col("c_custkey").as("acct_key"), lit("customer").as("kind"))
    val s = Tables.supplier(spark, dir).filter(col("s_acctbal") > 5000)
      .select(col("s_suppkey").as("acct_key"), lit("supplier").as("kind"))
    c.unionByName(s).distinct().orderBy(col("kind"), col("acct_key"))
  }

  /** Set difference — nations with customers EXCEPT nations with
    * suppliers (U4 existing-vs-new difference, `chromadb_client.py:93-96`). */
  val q_nations_customers_only = QueryDef(
    "q_nations_customers_only",
    """SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer
      |EXCEPT SELECT DISTINCT CAST(s_nationkey AS BIGINT) FROM supplier
      |ORDER BY nationkey""".stripMargin) { (spark, dir) =>
    Tables.customer(spark, dir)
      .select(col("c_nationkey").cast("long").as("nationkey")).distinct()
      .except(Tables.supplier(spark, dir)
        .select(col("s_nationkey").cast("long").as("nationkey")).distinct())
      .orderBy(col("nationkey"))
  }

  /** MULTISET set operations (§2.7 completion): INTERSECT ALL /
    * EXCEPT ALL over the part-key bags of returned ('R') vs accepted
    * ('A') lineitems — duplicate-preserving semantics that the
    * DISTINCT set ops (q_key_accounts_union, q_nations_customers_only)
    * cannot express. Certified via per-op row/distinct counts. */
  val q_multiset_ops = QueryDef(
    "q_multiset_ops",
    """WITH ra AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'R'),
      |aa AS (SELECT l_partkey FROM lineitem WHERE l_returnflag = 'A'),
      |i AS (SELECT * FROM ra INTERSECT ALL SELECT * FROM aa),
      |e AS (SELECT * FROM ra EXCEPT ALL SELECT * FROM aa)
      |SELECT 'except_all' AS op, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT l_partkey) AS n_parts FROM e
      |UNION ALL
      |SELECT 'intersect_all' AS op, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT l_partkey) AS n_parts FROM i
      |ORDER BY op""".stripMargin) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val ra = li.filter(col("l_returnflag") === "R").select(col("l_partkey"))
    val aa = li.filter(col("l_returnflag") === "A").select(col("l_partkey"))
    def counts(df: org.apache.spark.sql.DataFrame, op: String) =
      df.agg(count(lit(1)).as("n_rows"),
        count_distinct(col("l_partkey")).as("n_parts"))
        .select(lit(op).as("op"), col("n_rows"), col("n_parts"))
    counts(ra.exceptAll(aa), "except_all")
      .unionByName(counts(ra.intersectAll(aa), "intersect_all"))
      .orderBy(col("op"))
  }

  /** Shipping-priority shape (TPC-H Q3 flavor): customer⨝orders⨝
    * lineitem with selective filters on both fact sides, revenue
    * aggregate, top-10. Exercises multi-join ordering + partial
    * aggregation + TakeOrderedAndProject in one plan. */
  val q_shipping_priority = QueryDef(
    "q_shipping_priority",
    """SELECT o.o_orderkey, CAST(o.o_orderdate AS DATE) AS order_date,
      |  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY o.o_orderkey, CAST(o.o_orderdate AS DATE)
      |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin) { (spark, dir) =>
    val c = Tables.customer(spark, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val l = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Region-volume shape (TPC-H Q5 flavor): five-way join through two
    * broadcast dims + three fact/entity tables, grouped revenue per
    * nation. */
  val q_region_volume = QueryDef(
    "q_region_volume",
    """SELECT n.n_name, COUNT(*) AS n_lines,
      |  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM lineitem l
      |JOIN orders o ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin) { (spark, dir) =>
    val o = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    Tables.lineitem(spark, dir)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Geospatial point-in-bbox lookup J2 (`nyc_neighborhoods.py:
    * 190-205`): 2-D points (embedding dims 1-2) against a broadcast
    * bbox dimension via BETWEEN on both axes — the reference's only
    * theta join, here a BroadcastNestedLoopJoin so the point table
    * never shuffles. Half-open cells ([min, max)) keep boundary points
    * single-assigned. The 4×4 grid spans [-0.5, 0.5) per axis.
    */
  val q_bbox_lookup = QueryDef(
    "q_bbox_lookup",
    """WITH pts AS (
      |  SELECT vec_id, CAST(embedding[1] AS DOUBLE) AS x,
      |    CAST(embedding[2] AS DOUBLE) AS y
      |  FROM embeddings),
      |boxes AS (
      |  SELECT CAST(g AS BIGINT) AS bbox_id,
      |    -0.5 + (CAST(g AS BIGINT) % 4) * 0.25 AS xmin,
      |    -0.5 + (CAST(g AS BIGINT) // 4) * 0.25 AS ymin
      |  FROM UNNEST(range(0, 16)) t(g))
      |SELECT b.bbox_id, COUNT(*) AS n_points,
      |  MIN(p.vec_id) AS first_vec, ROUND(AVG(p.x), 6) AS avg_x
      |FROM pts p JOIN boxes b
      |  ON p.x >= b.xmin AND p.x < b.xmin + 0.25
      | AND p.y >= b.ymin AND p.y < b.ymin + 0.25
      |GROUP BY b.bbox_id ORDER BY bbox_id""".stripMargin) { (spark, dir) =>
    val pts = Tables.embeddings(spark, dir).select(
      col("vec_id"),
      element_at(col("embedding"), 1).cast("double").as("x"),
      element_at(col("embedding"), 2).cast("double").as("y"))
    val boxes = spark.range(16).select(
      col("id").as("bbox_id"),
      (lit(-0.5) + (col("id") % 4) * lit(0.25)).as("xmin"),
      (lit(-0.5) + floor(col("id") / 4) * lit(0.25)).as("ymin"))
    pts.join(broadcast(boxes),
        col("x") >= col("xmin") && col("x") < col("xmin") + 0.25 &&
          col("y") >= col("ymin") && col("y") < col("ymin") + 0.25)
      .groupBy(col("bbox_id"))
      .agg(count(lit(1)).as("n_points"), min(col("vec_id")).as("first_vec"),
        round(avg(col("x")), 6).as("avg_x"))
      .orderBy(col("bbox_id"))
  }

  /** Substring-prefix lookup join J3 (`nyc_neighborhoods.py:176-187`
    * joins on `substring(zip, 1, 3)`): parts joined to a broadcast
    * digit→tier dimension on the first digit of the brand number —
    * an equi join on a computed prefix key.
    */
  val q_brand_prefix_join = QueryDef(
    "q_brand_prefix_join",
    """WITH dim AS (
      |  SELECT CAST(g AS VARCHAR) AS digit,
      |    CASE WHEN g <= 2 THEN 'legacy' ELSE 'modern' END AS tier
      |  FROM UNNEST(range(1, 6)) t(g))
      |SELECT d.tier, COUNT(*) AS n_parts,
      |  COUNT(DISTINCT p.p_brand) AS n_brands,
      |  CAST(SUM(CAST(FLOOR(p.p_retailprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    / 100.0 AS total_price
      |FROM part p JOIN dim d ON substr(p.p_brand, 7, 1) = d.digit
      |GROUP BY d.tier ORDER BY d.tier""".stripMargin) { (spark, dir) =>
    val dim = spark.range(1, 6).select(
      col("id").cast("string").as("digit"),
      when(col("id") <= 2, "legacy").otherwise("modern").as("tier"))
    Tables.part(spark, dir)
      .join(broadcast(dim), substring(col("p_brand"), 7, 1) === col("digit"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_parts"),
        countDistinct(col("p_brand")).as("n_brands"),
        // order-free cent sum (PERF.md determinism policy)
        (sum(floor(col("p_retailprice") * 100 + 0.5).cast("long")) / lit(100.0))
          .as("total_price"))
      .orderBy(col("tier"))
  }

  /** Blocked fuzzy entity resolution (record linkage): a deterministic
    * "dirty" feed (part names with 1–2 trailing chars truncated) is
    * matched back to the clean catalog — equi-join on a blocking key
    * (first name word) so candidate generation is bucketed, never
    * all-pairs; `levenshtein` (codegen built-in on both engines) scores
    * candidates; best match per dirty record by (distance, key) rank.
    * The reference analogue is source-record reconciliation before
    * upsert (`psql_db_client.py:240-268` ON CONFLICT merge); at 100 TB
    * the blocking key is the shuffle key and skewed blocks split under
    * AQE.
    */
  val q_fuzzy_match = QueryDef(
    "q_fuzzy_match",
    """WITH dirty AS (
      |  SELECT p_partkey AS dirty_id,
      |    substr(p_name, 1, CAST(len(p_name) - 1 - p_partkey % 2 AS INT))
      |      AS dirty_name,
      |    split_part(p_name, ' ', 1) || ' '
      |      || substr(split_part(p_name, ' ', 2), 1, 1) AS block
      |  FROM part WHERE p_partkey % 3 = 0),
      |cand AS (
      |  SELECT d.dirty_id, d.dirty_name, p.p_partkey AS match_id,
      |    levenshtein(d.dirty_name, p.p_name) AS dist
      |  FROM dirty d JOIN part p
      |    ON split_part(p.p_name, ' ', 1) || ' '
      |      || substr(split_part(p.p_name, ' ', 2), 1, 1) = d.block
      |  WHERE abs(len(d.dirty_name) - len(p.p_name)) <= 3
      |    AND levenshtein(d.dirty_name, p.p_name) <= 3)
      |SELECT dirty_id, dirty_name,
      |  CAST(MIN(dist * 1099511627776 + match_id) % 1099511627776 AS BIGINT) AS match_id,
      |  CAST(MIN(dist * 1099511627776 + match_id) // 1099511627776 AS BIGINT) AS dist,
      |  CAST(COUNT(*) AS BIGINT) AS n_cands
      |FROM cand GROUP BY 1, 2 ORDER BY dirty_id""".stripMargin) { (spark, dir) =>
    val part = Tables.part(spark, dir)
    // blocking key: adjective + noun initial — the 1-char noun prefix is
    // the longest prefix guaranteed stable under the ≤2-trailing-char
    // corruption (min noun length is 3), so recall stays 100% while the
    // block fan-out drops ~8× vs adjective-only blocking
    val blockOf = (name: org.apache.spark.sql.Column) =>
      concat(substring_index(name, " ", 1), lit(" "),
        substring(element_at(split(name, " "), 2), 1, 1))
    // the dirty feed is a tiny scan that fans out ~300 candidates per
    // row through the broadcast join: without an explicit repartition
    // the whole expansion inherits the scan's single file split and
    // runs in ONE task. Round-robin spread (the join side is broadcast,
    // so no co-location is lost) decouples work parallelism from input
    // splits — the general rule for expansion-heavy ops over small
    // driving tables.
    val dirty = part
      .filter(col("p_partkey") % 3 === 0)
      .select(col("p_partkey").as("dirty_id"),
        expr("substr(p_name, 1, cast(length(p_name) - 1 - p_partkey % 2 as int))")
          .as("dirty_name"),
        blockOf(col("p_name")).as("block"))
      .repartition(spark.sessionState.conf.numShufflePartitions)
    val cand = dirty
      .join(part.withColumn("block", blockOf(col("p_name"))), "block")
      .filter(abs(length(col("dirty_name")) - length(col("p_name"))) <= 3)
      .select(col("dirty_id"), col("dirty_name"),
        col("p_partkey").as("match_id"),
        // 3-arg levenshtein abandons a row at distance > threshold
        // (returns -1) instead of filling the full DP matrix — the
        // banded early exit that matters when most candidates are far
        levenshtein(col("dirty_name"), col("p_name"), 3).as("dist"))
      .filter(col("dist") >= 0 && col("dist") <= 3)
    // best-match via a commutative encoded-min aggregate (dist and key
    // packed into one long), NOT a row_number window: partial hash
    // aggregation combines map-side, so the exchange carries ≤1 row per
    // (dirty record × partition) instead of sorting every candidate
    // pair — the argmin shape that survives a 100 TB candidate set
    cand
      .groupBy(col("dirty_id"), col("dirty_name"))
      .agg(min(col("dist").cast("long") * (1L << 40) + col("match_id"))
        .as("enc"), count(lit(1)).as("n_cands"))
      .select(col("dirty_id"), col("dirty_name"),
        (col("enc") % (1L << 40)).as("match_id"),
        expr("enc div 1099511627776").as("dist"), col("n_cands"))
      .orderBy(col("dirty_id"))
  }

  /** Share-of-parent hierarchical ratio: each nation's order volume as
    * basis points of its region's total — the ratio-to-parent rollup
    * every drill-down dashboard needs, computed WINDOWLESS: child
    * aggregate, parent re-aggregate (tiny), broadcast join-back, exact
    * integer bp. At 100 TB only the first aggregate sees the fact
    * table; the parent table is |nations| rows.
    */
  val q_share_of_region = QueryDef(
    "q_share_of_region",
    """WITH vol AS (
      |  SELECT n.n_regionkey AS regionkey, n.n_name AS nation,
      |    CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation n ON c.c_nationkey = n.n_nationkey
      |  GROUP BY 1, 2),
      |r AS (SELECT regionkey, CAST(SUM(cents) AS BIGINT) AS rcents
      |  FROM vol GROUP BY 1)
      |SELECT rg.r_name AS region, v.nation, v.cents,
      |  (v.cents * 10000) // r.rcents AS share_bp
      |FROM vol v JOIN r ON v.regionkey = r.regionkey
      |JOIN region rg ON rg.r_regionkey = v.regionkey
      |ORDER BY region, nation""".stripMargin) { (spark, dir) =>
    val vol = Tables.orders(spark, dir)
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(spark, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_regionkey").as("regionkey"), col("n_name").as("nation"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long"))
        .as("cents"))
    val r = vol.groupBy(col("regionkey")).agg(sum(col("cents")).as("rcents"))
    vol.join(broadcast(r), Seq("regionkey"))
      .join(broadcast(Tables.region(spark, dir)),
        col("r_regionkey") === col("regionkey"))
      .select(col("r_name").as("region"), col("nation"), col("cents"),
        expr("(cents * 10000) div rcents").as("share_bp"))
      .orderBy(col("region"), col("nation"))
  }

  /** TPC-H Q8-shaped market share: within one region's market (customer
    * side resolves order → nation → region), the per-year revenue share
    * of ONE supplier nation (supplier side resolves lineitem → supplier
    * → nation) — the two-sided dimension resolution over the fact table
    * that is the canonical star-join stress shape. Revenue quantized to
    * exact cents per line item BEFORE summing (order-free), share in
    * basis points by integer division. Plan: lineitem⋈orders is the one
    * real shuffle; nation/region broadcast; supplier joins as a plain
    * equi-join (a dimension AQE broadcasts at test scale and shuffles
    * at warehouse scale — TPC-H sizes supplier at 1% of the fact rows).
    */
  val q_market_share = QueryDef(
    "q_market_share",
    """WITH v AS (
      |  SELECT CAST(EXTRACT(YEAR FROM CAST(o.o_orderdate AS TIMESTAMP))
      |      AS BIGINT) AS yr,
      |    CAST(FLOOR(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
      |      AS BIGINT) AS cents,
      |    s.s_nationkey = 7 AS is_target
      |  FROM lineitem l
      |  JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  JOIN customer c ON o.o_custkey = c.c_custkey
      |  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
      |  JOIN region r ON cn.n_regionkey = r.r_regionkey
      |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |  WHERE r.r_name = 'ASIA')
      |SELECT yr,
      |  CAST(SUM(CASE WHEN is_target THEN cents ELSE 0 END) AS BIGINT)
      |    AS nation_cents,
      |  CAST(SUM(cents) AS BIGINT) AS market_cents,
      |  CAST((SUM(CASE WHEN is_target THEN cents ELSE 0 END) * 10000)
      |    // SUM(cents) AS BIGINT) AS share_bp
      |FROM v GROUP BY yr ORDER BY yr""".stripMargin) { (spark, dir) =>
    val asiaNations = broadcast(Tables.nation(spark, dir)
      .join(broadcast(Tables.region(spark, dir)
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey")))
    Tables.lineitem(spark, dir)
      .join(Tables.orders(spark, dir),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, dir),
        col("o_custkey") === col("c_custkey"))
      .join(asiaNations, col("c_nationkey") === col("n_nationkey"))
      .join(Tables.supplier(spark, dir),
        col("l_suppkey") === col("s_suppkey"))
      .select(year(col("o_orderdate")).cast("long").as("yr"),
        floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100
          + 0.5).cast("long").as("cents"),
        (col("s_nationkey") === 7).as("is_target"))
      .groupBy(col("yr"))
      .agg(sum(when(col("is_target"), col("cents")).otherwise(0L))
          .as("nation_cents"),
        sum(col("cents")).as("market_cents"))
      .select(col("yr"), col("nation_cents"), col("market_cents"),
        expr("(nation_cents * 10000) DIV market_cents").as("share_bp"))
      .orderBy(col("yr"))
  }

  /** Market-basket pair mining: parts co-purchased in the same order,
    * with independence lift — the classic co-occurrence recommender
    * primer. The pair fan-out is a self-equi-join on the order key, so
    * work is Σ basket² — basket-size bounded (TPC-H orders hold ≤7
    * lines), never catalog². Marginals broadcast; top-20 by support is
    * a TakeOrderedAndProject, no global sort materialization.
    */
  val q_basket_pairs = QueryDef(
    "q_basket_pairs",
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |np AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n FROM items GROUP BY 1),
      |no AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM items),
      |pairs AS (
      |  SELECT a.pk AS part_a, b.pk AS part_b,
      |    CAST(COUNT(*) AS BIGINT) AS n_orders
      |  FROM items a JOIN items b ON a.ok = b.ok AND a.pk < b.pk
      |  GROUP BY 1, 2)
      |SELECT part_a, part_b, n_orders,
      |  (n_orders * no.n * 1000000) // (na.n * nb.n) AS lift_micro
      |FROM pairs CROSS JOIN no
      |JOIN np na ON na.pk = part_a JOIN np nb ON nb.pk = part_b
      |ORDER BY n_orders DESC, part_a, part_b LIMIT 20""".stripMargin) { (spark, dir) =>
    val items = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val itemsM = graft.ops.Reuse.materialized(items)
    val np = itemsM.groupBy(col("pk")).agg(count(lit(1)).as("n"))
    val no = itemsM.agg(countDistinct(col("ok")).as("n_total"))
    val a = itemsM.select(col("ok"), col("pk").as("part_a"))
    val b = itemsM.select(col("ok").as("ok_b"), col("pk").as("part_b"))
    a.join(b, col("ok") === col("ok_b") && col("part_a") < col("part_b"))
      .groupBy(col("part_a"), col("part_b"))
      .agg(count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(no))
      .join(broadcast(np.select(col("pk").as("part_a"), col("n").as("na"))),
        Seq("part_a"))
      .join(broadcast(np.select(col("pk").as("part_b"), col("n").as("nb"))),
        Seq("part_b"))
      .select(col("part_a"), col("part_b"), col("n_orders"),
        expr("(n_orders * n_total * 1000000) div (na * nb)").as("lift_micro"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  val all: Seq[QueryDef] = Seq(
    q_basket_pairs,
    q_pricing_summary, q_top_parts, q_priority_counts, q_customer_by_region,
    q_revenue_by_priority, q_customers_no_orders, q_parts_shipped_1999,
    q_price_tiers, q_order_size_classes, q_lineitem_stats,
    q_distinct_parts_per_status, q_key_accounts_union, q_nations_customers_only,
    q_multiset_ops,
    q_shipping_priority, q_region_volume, q_bbox_lookup, q_brand_prefix_join,
    q_fuzzy_match, q_share_of_region, q_market_share)
}
