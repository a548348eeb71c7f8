package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.BloomOps
import org.apache.spark.sql.functions._

/** Scale-mechanics operators: techniques whose POINT is the 100 TB
  * execution shape (runtime-filter pruning, mergeable sketches, data
  * layout), each certified against an oracle that states the
  * equivalent semantics without the mechanism — proving the mechanism
  * changes the plan, not the answer.
  */
object ScaleQueries {

  /** Runtime Bloom-filter join pruning ([[BloomOps.bloomPrunedJoin]]):
    * lineitem pruned through a 2^16-bit / 3-hash Bloom filter of the
    * urgent-1997 order keys before the join. The oracle is the PLAIN
    * join — certifying that the pruned plan is result-identical (no
    * false negatives; false positives removed by the exact join).
    * Reference analog: every dashboard join against a filtered
    * dimension (`app_upgraded.py` date-window fetches); at 100 TB the
    * pruned probe rows never reach the shuffle.
    */
  val q_bloom_join = QueryDef(
    "q_bloom_join",
    """SELECT MONTH(o.o_orderdate) AS mon,
      |  COUNT(*) AS n_items,
      |  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val small = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    BloomOps.bloomPrunedJoin(
        Tables.lineitem(spark, dir), small, "l_orderkey", "o_orderkey")
      .groupBy(month(col("o_orderdate")).cast("long").as("mon"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy(col("mon"))
  }

  /** Mergeable log-binned quantile sketch
    * ([[graft.ops.SketchOps.quantileSketchBins]] +
    * [[graft.ops.SketchOps.quantileSketchRead]]): each value folds
    * into one of ~16·64 integer bins, quantiles read off the
    * cumulative bin counts. At 100 TB this replaces the full
    * shuffle-sort that exact `percentile()` needs with a few-KB
    * mergeable summary per partition; the streaming sibling
    * q_stream_quantile certifies the merge against this SAME oracle.
    */
  val q_quantile_sketch = QueryDef(
    "q_quantile_sketch", graft.ops.SketchOps.quantileSketchOracleSql) {
    (spark, dir) =>
      graft.ops.SketchOps.quantileSketchRead(spark,
        graft.ops.SketchOps.quantileSketchBins(
          Tables.events(spark, dir).select(col("event_type"), col("value"))))
  }

  /** Z-order (Morton) spatial layout: 16-bit-quantized 2-D points
    * interleaved into a 32-bit z-value via the standard fixed
    * shift-mask spread (no loops, no UDF — four mask steps per axis,
    * exact in both engines), then aggregated per 64×64 z-tile. At
    * 100 TB this is the write-side layout operator: sorting a table by
    * `z` clusters spatially-near rows into the same parquet row groups
    * so min/max column stats prune 2-D range scans — the Delta/Iceberg
    * OPTIMIZE ZORDER primitive. The locality win is asserted
    * quantitatively in ScaleOpsSpec (z-sorted partition bounding boxes
    * vs id-sorted).
    */
  val q_zorder_tiles = QueryDef(
    "q_zorder_tiles",
    """WITH pts AS (
      |  SELECT vec_id,
      |    LEAST(GREATEST(CAST(FLOOR((CAST(embedding[1] AS DOUBLE) + 0.5) * 65536)
      |      AS BIGINT), 0), 65535) AS xq,
      |    LEAST(GREATEST(CAST(FLOOR((CAST(embedding[2] AS DOUBLE) + 0.5) * 65536)
      |      AS BIGINT), 0), 65535) AS yq
      |  FROM embeddings),
      |sx1 AS (SELECT vec_id, yq, (xq | (xq << 8)) & 16711935 AS t FROM pts),
      |sx2 AS (SELECT vec_id, yq, (t | (t << 4)) & 252645135 AS t FROM sx1),
      |sx3 AS (SELECT vec_id, yq, (t | (t << 2)) & 858993459 AS t FROM sx2),
      |sx4 AS (SELECT vec_id, yq, (t | (t << 1)) & 1431655765 AS sx FROM sx3),
      |sy1 AS (SELECT vec_id, sx, (yq | (yq << 8)) & 16711935 AS t FROM sx4),
      |sy2 AS (SELECT vec_id, sx, (t | (t << 4)) & 252645135 AS t FROM sy1),
      |sy3 AS (SELECT vec_id, sx, (t | (t << 2)) & 858993459 AS t FROM sy2),
      |sy4 AS (SELECT vec_id, sx, (t | (t << 1)) & 1431655765 AS sy FROM sy3),
      |z AS (SELECT vec_id, sx | (sy << 1) AS z FROM sy4)
      |SELECT z >> 20 AS tile, CAST(COUNT(*) AS BIGINT) AS n_points,
      |  MIN(vec_id) AS first_vec
      |FROM z GROUP BY 1 ORDER BY tile""".stripMargin) { (spark, dir) =>
    val pts = Tables.embeddings(spark, dir)
      .select(col("vec_id"), quant16(1).as("xq"), quant16(2).as("yq"))
    withMortonZ(pts)
      .groupBy(expr("shiftright(z, 20)").as("tile"))
      .agg(count(lit(1)).as("n_points"), min(col("vec_id")).as("first_vec"))
      .orderBy(col("tile"))
  }

  /** 16-bit grid quantization of embedding dim `dim` ∈ [-0.5, 0.5). */
  def quant16(dim: Int): org.apache.spark.sql.Column =
    least(greatest(
      floor((element_at(col("embedding"), dim).cast("double") + 0.5) * 65536)
        .cast("long"), lit(0L)), lit(65535L))

  /** Adds the 32-bit Morton `z` of columns `xq`,`yq` (fixed shift-mask
    * bit spread — pure integer column algebra, shared by the query and
    * the locality spec).
    */
  def withMortonZ(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    def spread(in: String, out: String)(d: org.apache.spark.sql.DataFrame) =
      d.withColumn(out, expr(s"($in | shiftleft($in, 8)) & 16711935"))
        .withColumn(out, expr(s"($out | shiftleft($out, 4)) & 252645135"))
        .withColumn(out, expr(s"($out | shiftleft($out, 2)) & 858993459"))
        .withColumn(out, expr(s"($out | shiftleft($out, 1)) & 1431655765"))
    spread("yq", "sy")(spread("xq", "sx")(df))
      .withColumn("z", expr("sx | shiftleft(sy, 1)"))
      .drop("sx", "sy")
  }

  private val ProfileCols = Seq(
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate")

  /** Table profiler — the data-quality sweep a pipeline runs before
    * training ingestion: per column, row/null/exact-distinct counts in
    * ONE pass over the table (Spark plans the multi-distinct via one
    * Expand — 11 replicas of each row, map-side partials, no per-column
    * rescans). At 100 TB the exact COUNT(DISTINCT) columns would swap
    * to the certified HLL sketch (q_hll_distinct) — same output shape,
    * constant memory; the exact form here doubles as its ground truth.
    */
  val q_table_profile = QueryDef(
    "q_table_profile", {
      val parts = ProfileCols.map(c =>
        s"""  SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |    CAST(COALESCE(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END), 0)
           |      AS BIGINT) AS n_nulls,
           |    CAST(COUNT(DISTINCT $c) AS BIGINT) AS n_distinct
           |  FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")
      s"SELECT * FROM (\n$parts\n) ORDER BY col_name"
    }) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val aggs = ProfileCols.flatMap(c => Seq(
      count(lit(1)).as(s"r_$c"),
      sum(col(c).isNull.cast("long")).as(s"n_$c"),
      countDistinct(col(c)).as(s"d_$c")))
    val stack = ProfileCols
      .map(c => s"'$c', r_$c, coalesce(n_$c, 0L), d_$c").mkString(", ")
    // toy-scale inputs arrive as ONE unsplittable row group, which
    // serializes the 11-replica Expand + partial aggregate on a single
    // thread (round-13, measured ~4 s of the 5 s bench row; the sketch
    // sibling has carried the same spread since round 10). Fan the
    // compact raw columns across the cores first; at scale the scan
    // already yields >= parallelism partitions and this is a no-op.
    // Aggregation is order-free, so results are unchanged.
    val par = spark.sparkContext.defaultParallelism
    val raw = li.select(ProfileCols.map(col): _*)
    val spread =
      if (raw.rdd.getNumPartitions < par) raw.repartition(par) else raw
    spread.agg(aggs.head, aggs.tail: _*)
      .selectExpr(s"stack(${ProfileCols.length}, $stack) " +
        "AS (col_name, n_rows, n_nulls, n_distinct)")
      .orderBy(col("col_name"))
  }

  /** Per-column canonical stringification shared by both engines —
    * the cross-engine hash contract for the sketch profiler. Doubles
    * quantize to cents (exact for TPC-H money/quantity columns),
    * timestamps to epoch millis; both are integer-exact in Spark and
    * DuckDB where raw double/timestamp rendering is not.
    * (name, spark SQL expr, duckdb SQL expr).
    */
  private val ProfileCanon: Seq[(String, String, String)] = ProfileCols.map {
    case c @ ("l_returnflag" | "l_linestatus") =>
      (c, c, c)
    case c @ ("l_quantity" | "l_extendedprice" | "l_discount" | "l_tax") =>
      (c, s"CAST(CAST(FLOOR($c * 100 + 0.5) AS BIGINT) AS STRING)",
        s"CAST(CAST(FLOOR($c * 100 + 0.5) AS BIGINT) AS VARCHAR)")
    case c @ "l_shipdate" =>
      // TIMESTAMP_NTZ (no TZ in either engine): the naive wall-clock
      // rendering "yyyy-MM-dd HH:mm:ss" is identical in both — where
      // an epoch-millis route would need a TZ-dependent cast in Spark
      (c, s"CAST($c AS STRING)", s"CAST($c AS VARCHAR)")
    case c =>
      (c, s"CAST($c AS STRING)", s"CAST($c AS VARCHAR)")
  }

  /** The SKETCH table profiler — q_table_profile's coded 100 TB swap:
    * same per-column rows/nulls sweep, but distinct counts come from
    * the certified HLL sketch instead of the 11-replica exact
    * multi-distinct, and the WHOLE profile comes out of ONE
    * [[graft.functions.MultiHllSketch]] pass: every input row updates
    * all 11 columns' registers and counts in a single fixed-size
    * aggregation buffer. No `stack` unpivot (the previous certified
    * shape still pushed 11 physical rows per input row through the
    * hash aggregate), no Expand, no per-row group probing; the shuffle
    * carries one ~3 KB buffer per map task regardless of input size.
    * The register/estimate arithmetic is byte-identical to the
    * row-oriented certified path (asserted in SketchSpec), so the
    * oracle is unchanged. No exact COUNT(DISTINCT) anywhere (the exact
    * sibling doubles as its ground truth at test scale).
    */
  val q_table_profile_sketch = QueryDef(
    "q_table_profile_sketch",
    graft.ops.SketchOps.hllProfileOracleSql(
      "lineitem", ProfileCanon.map { case (n, _, d) => (n, d) })) { (spark, dir) =>
    val li = Tables.lineitem(spark, dir)
    val names = array(ProfileCanon.map { case (n, _, _) => lit(n) }: _*)
    // canonicalize in a codegen'd projection BEFORE the aggregate: the
    // TypedImperativeAggregate evaluates its children interpreted
    // per-row, so feeding it plain attributes keeps the cast/floor
    // chains in whole-stage codegen
    // toy-scale inputs arrive as ONE unsplittable row group (a 10 MB
    // single-file scan), which would serialize the whole update loop on
    // one thread; fan the COMPACT raw columns across the cores first
    // (canonical strings are ~6× wider — render them after the
    // exchange, fused into the aggregate's stage). At scale the scan
    // already yields >= parallelism partitions and this is a no-op.
    val par = spark.sparkContext.defaultParallelism
    val raw = li.select(ProfileCols.map(col): _*)
    val spread = (if (raw.rdd.getNumPartitions < par) raw.repartition(par)
      else raw).select(
      ProfileCanon.map { case (n, s, _) => expr(s).as(n) }: _*)
    val prof = graft.ops.Reuse.materialized( // 11 rows — read off twice
      spread.agg(graft.functions.MultiHllSketch.multiHll(
          ProfileCanon.map { case (n, _, _) => col(n) }).as("prof"))
        .select(posexplode(col("prof")).as(Seq("ci", "p")))
        .select(element_at(names, col("ci") + 1).as("grp"),
          col("p.n_rows").as("n_rows"), col("p.n_nulls").as("n_nulls"),
          col("p.regs").as("regs")))
    val hll = graft.ops.SketchOps.hllEstimateOnly(
      prof.select(col("grp"), posexplode(col("regs")).as(Seq("idx", "reg")))
        .filter(col("reg") >= 1), // dense table → the sparse certified form
      "grp")
    prof.select(col("grp"), col("n_rows"), col("n_nulls"))
      // empty input: the global agg still emits its zero buffer, but the
      // oracle's per-column UNION ALL scan emits nothing — drop the
      // zero-row columns so both engines agree on the empty table
      .filter(col("n_rows") > 0)
      .join(hll, Seq("grp"), "left")
      .select(col("grp").as("col_name"), col("n_rows"), col("n_nulls"),
        coalesce(col("n_hll"), lit(0.0)).as("n_hll"))
      .orderBy(col("col_name"))
  }

  /** Bucketed interval join ([[graft.ops.JoinOps.intervalJoin]]):
    * every lineitem shipped inside an urgent order's 3-day fulfilment
    * window `[o_orderdate, o_orderdate + 3d)` — ~2.4k intervals ×
    * ~60k points at sf0.01, no join key. The oracle states the naive
    * theta-join (`ON l.d >= u.d0 AND l.d < u.d0 + 3`); the engine
    * runs the bucketed-blocking plan — day-wide buckets, each
    * interval replicated to ≤ 3 buckets, ONE equi-join shuffle with
    * the range predicate as residual — certifying that blocking
    * changes the plan, not the answer. Reference analog: the
    * dashboard's date-window joins of cases against alert spans
    * (`app_comparative.py` period overlays). Quantities are
    * cent-quantized BEFORE the sum (order-free across engines).
    */
  val q_interval_join = QueryDef(
    "q_interval_join",
    """WITH urgent AS (
      |  SELECT o_orderkey,
      |    datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d0
      |  FROM orders WHERE o_orderpriority = '1-URGENT'),
      |pts AS (
      |  SELECT datediff('day', DATE '1970-01-01', CAST(l_shipdate AS DATE)) AS d,
      |    l_quantity
      |  FROM lineitem)
      |SELECT u.o_orderkey, COUNT(*) AS n_shipped,
      |  CAST(SUM(CAST(FLOOR(p.l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |    AS qty_cents
      |FROM urgent u JOIN pts p ON p.d >= u.d0 AND p.d < u.d0 + 3
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val epoch = to_date(lit("1970-01-01"))
    // round-13: the single-row-group lineitem scan ran the broadcast
    // probe + partial aggregate of all 600k points on ONE task; spread
    // the 2-column point rows first (no-op at scale — guide §2.5)
    val par = spark.sparkContext.defaultParallelism
    val pts0 = Tables.lineitem(spark, dir).select(
      datediff(to_date(col("l_shipdate")), epoch).cast("long").as("d"),
      col("l_quantity"))
    val pts = if (pts0.rdd.getNumPartitions < par) pts0.repartition(par) else pts0
    val urgent = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"),
        datediff(to_date(col("o_orderdate")), epoch).cast("long").as("d0"))
      .withColumn("d1", col("d0") + lit(3L))
    graft.ops.JoinOps.intervalJoin(pts, "d", urgent, "d0", "d1", bucketWidth = 1L)
      .groupBy(col("o_orderkey"))
      .agg(count(lit(1)).as("n_shipped"),
        sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qty_cents"))
      .orderBy(col("o_orderkey"))
  }

  /** Order-free cross-engine table fingerprints — the reconciliation
    * primitive a 100 TB migration runs on BOTH systems to prove a copy
    * is byte-faithful without moving data: per table, row count + XOR
    * and modular-sum of per-row 60-bit md5 fingerprints over a
    * canonical `|`-joined string of stable fields (integers, µs
    * epochs, cent-quantized amounts — never raw float formatting,
    * which differs across engines). XOR catches any single-row change
    * but cancels on duplicated rows; the mod-sum (1e9+7 residues,
    * overflow-safe to ~9e9 rows per partition-sum) catches
    * duplication — together they pin the multiset. Both aggregates are
    * commutative → map-side partials, one 3-row result regardless of
    * input size, no sort anywhere.
    */
  val q_table_checksum = QueryDef(
    "q_table_checksum", {
      val evRow = "concat_ws('|', CAST(event_id AS VARCHAR), " +
        "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), " +
        "CAST(user_id AS VARCHAR), event_type, " +
        "CAST(CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS VARCHAR))"
      val docRow = "concat_ws('|', CAST(doc_id AS VARCHAR), md5(text), " +
        "lang, source, CAST(n_chars AS VARCHAR))"
      val ordRow = "concat_ws('|', CAST(o_orderkey AS VARCHAR), " +
        "CAST(o_custkey AS VARCHAR), o_orderstatus, " +
        "CAST(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS VARCHAR), " +
        "CAST(epoch_us(CAST(o_orderdate AS TIMESTAMP)) AS VARCHAR), " +
        "o_orderpriority)"
      def fp(row: String): String =
        s"('0x' || substr(md5($row), 1, 15))::BIGINT"
      def one(table: String, row: String): String =
        s"""SELECT '$table' AS table_name, COUNT(*) AS n_rows,
           |  CAST(bit_xor(${fp(row)}) AS BIGINT) AS xor_fp,
           |  CAST(SUM(${fp(row)} % 1000000007) AS BIGINT) AS modsum_fp
           |FROM $table""".stripMargin
      one("events", evRow) + "\nUNION ALL\n" + one("documents", docRow) +
        "\nUNION ALL\n" + one("orders", ordRow) +
        "\nORDER BY table_name"
    }) { (spark, dir) =>
    def fp(row: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      conv(substring(md5(row), 1, 15), 16, 10).cast("long")
    def one(name: String, df: org.apache.spark.sql.DataFrame,
        row: org.apache.spark.sql.Column) = {
      val h = fp(row)
      df.select(h.as("h"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(h)").as("xor_fp"),
          sum(pmod(col("h"), lit(1000000007L))).as("modsum_fp"))
        .select(lit(name).as("table_name"), col("n_rows"), col("xor_fp"),
          col("modsum_fp"))
    }
    val ev = one("events", Tables.events(spark, dir),
      concat_ws("|", col("event_id").cast("string"),
        unix_micros(col("ts")).cast("string"), col("user_id").cast("string"),
        col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").cast("string")))
    val docs = one("documents", Tables.documents(spark, dir),
      concat_ws("|", col("doc_id").cast("string"), md5(col("text")),
        col("lang"), col("source"), col("n_chars").cast("string")))
    val ords = one("orders",
      Tables.normalizeTs(spark, Tables.orders(spark, dir), "o_orderdate"),
      concat_ws("|", col("o_orderkey").cast("string"),
        col("o_custkey").cast("string"), col("o_orderstatus"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").cast("string"),
        unix_micros(col("o_orderdate")).cast("string"),
        col("o_orderpriority")))
    ev.unionByName(docs).unionByName(ords).orderBy(col("table_name"))
  }

  /** GLOBAL equi-depth deciles without a global sort — the companion
    * to q_equidepth_bins' per-stratum NTILE. Boundary k = the smallest
    * value whose cumulative count covers k/10 of the rows (cum·10 ≥
    * k·N in exact integers), read off a CDF over DISTINCT values —
    * the window is value-DOMAIN-bounded (cents ∈ [1, 49002]), not
    * row-bounded, so it stays one small partition at any row count.
    * Rows then bin by broadcast range lookup (bin = 1 + #boundaries
    * below). Ties share a bin (value-defined, unlike NTILE's
    * tie-splitting): counts per bin are approximately-equal up to tie
    * mass, which is the honest semantics of value boundaries — and
    * exactly what the mergeable quantile sketch would hand back at
    * 100 TB with an unbounded value domain.
    */
  val q_global_bins = QueryDef(
    "q_global_bins",
    """WITH t AS (
      |  SELECT CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
      |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM t),
      |vals AS (SELECT cents, CAST(COUNT(*) AS BIGINT) AS c FROM t GROUP BY 1),
      |cdf AS (SELECT cents, CAST(SUM(c) OVER (ORDER BY cents
      |  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum FROM vals),
      |ks AS (SELECT k FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) t(k)),
      |bounds AS (
      |  SELECT k, MIN(cents) AS b
      |  FROM ks CROSS JOIN n JOIN cdf ON cdf.cum * 10 >= k * n.ntot
      |  GROUP BY k),
      |bi AS (
      |  SELECT v.cents, v.c,
      |    CAST(1 + SUM(CASE WHEN bo.b < v.cents THEN 1 ELSE 0 END) AS BIGINT)
      |      AS bin
      |  FROM vals v CROSS JOIN bounds bo GROUP BY v.cents, v.c)
      |SELECT bin, CAST(SUM(c) AS BIGINT) AS n, MIN(cents) AS lo,
      |  MAX(cents) AS hi
      |FROM bi GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val t = Tables.events(spark, dir)
      .select(floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    val vals = t.groupBy(col("cents")).agg(count(lit(1)).as("c"))
    val wCdf = org.apache.spark.sql.expressions.Window.orderBy(col("cents"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cdf = vals.withColumn("cum", sum(col("c")).over(wCdf))
    val nDf = t.agg(count(lit(1)).as("ntot"))
    val ks = spark.range(1, 10).select(col("id").as("k"))
    val bounds = ks.crossJoin(broadcast(nDf))
      .join(cdf, col("cum") * 10 >= col("k") * col("ntot"))
      .groupBy(col("k")).agg(min(col("cents")).as("b"))
    vals.crossJoin(broadcast(bounds))
      .groupBy(col("cents"), col("c"))
      .agg((lit(1) + sum(when(col("b") < col("cents"), 1).otherwise(0)))
        .cast("long").as("bin"))
      .groupBy(col("bin"))
      .agg(sum(col("c")).as("n"), min(col("cents")).as("lo"),
        max(col("cents")).as("hi"))
      .orderBy(col("bin"))
  }

  /** INTERVAL×INTERVAL overlap join
    * ([[graft.ops.JoinOps.intervalOverlapJoin]]): click activity
    * windows × purchase windows (each event held open for its
    * cent-value × 10 ms), rolled up to per-day overlap counts +
    * total overlapped time. The oracle is the plain theta join —
    * certifying that bucket blocking + the canonical-bucket
    * once-per-pair rule is result-identical while planning as ONE
    * equi-join shuffle (PlanSpec's cartesian sweep covers it). Day
    * keys are integer epoch-days (µs // 86.4e9) — no timezone in
    * either engine. EMPTY intervals ([t, t), a zero-cent event) are
    * excluded on BOTH sides: the half-open overlap predicate
    * `sa < eb AND sb < ea` would otherwise treat an empty interval
    * as the point t — a real sf0.1 event surfaced exactly this.
    */
  val q_interval_overlap = QueryDef(
    "q_interval_overlap",
    """WITH iv AS (
      |  SELECT event_id, event_type,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS s,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      + CAST(FLOOR(value * 100 + 0.5) AS BIGINT) * 10000 AS e
      |  FROM events),
      |a AS (SELECT event_id AS aid, s AS sa, e AS ea FROM iv
      |  WHERE event_type = 'click' AND s < e),
      |b AS (SELECT event_id AS bid, s AS sb, e AS eb FROM iv
      |  WHERE event_type = 'purchase' AND s < e),
      |p AS (
      |  SELECT GREATEST(sa, sb) AS ov_s, LEAST(ea, eb) AS ov_e
      |  FROM a JOIN b ON sa < eb AND sb < ea)
      |SELECT ov_s // 86400000000 AS day_idx,
      |  CAST(COUNT(*) AS BIGINT) AS n_overlaps,
      |  CAST(SUM(ov_e - ov_s) AS BIGINT) AS total_overlap_us
      |FROM p GROUP BY 1 ORDER BY day_idx""".stripMargin) { (spark, dir) =>
    val iv = Tables.events(spark, dir).select(
      col("event_id"), col("event_type"),
      unix_micros(col("ts")).as("s"),
      (unix_micros(col("ts")) +
        floor(col("value") * 100 + 0.5).cast("long") * 10000L).as("e"))
    val a = iv.filter(col("event_type") === "click")
      .select(col("event_id").as("aid"), col("s").as("sa"), col("e").as("ea"))
    val b = iv.filter(col("event_type") === "purchase")
      .select(col("event_id").as("bid"), col("s").as("sb"), col("e").as("eb"))
    graft.ops.JoinOps.intervalOverlapJoin(
      a, "aid", "sa", "ea", b, "bid", "sb", "eb",
      bucketWidth = 600000000L) // 10 min ≈ 2.4× median span → ~1.4× replication
      .select((expr("ov_start div 86400000000")).as("day_idx"),
        col("ov_start"), col("ov_end"))
      .groupBy(col("day_idx"))
      .agg(count(lit(1)).as("n_overlaps"),
        sum(col("ov_end") - col("ov_start")).as("total_overlap_us"))
      .orderBy(col("day_idx"))
  }

  /** Incremental materialized-view maintenance ([[graft.ops.MvOps]]):
    * the daily (day × event_type) rollup is kept as STORED mergeable
    * state — count, sum, sum², min, max over exact cents — written
    * once as a day-bucketed catalog table from history before the
    * cutoff; the last week arrives as a delta batch that is aggregated
    * ALONE (O(|Δ|) scan) and monoid-merged with the stored state; mean
    * and population variance are derived from the merged moments at
    * read time. Certified against the DuckDB FULL-RECOMPUTE oracle:
    * the incrementally-maintained view is value-identical (including
    * the double-typed derived stats — computed from exact integer
    * moments by the same op sequence in both engines) to aggregating
    * the whole table from scratch. At 100 TB this is the difference
    * between a nightly full scan (`Sinks.refreshDailySummary`, the
    * reference's own refresh shape) and touching only today's ingest.
    */
  val q_mv_incremental = QueryDef(
    "q_mv_incremental",
    """WITH e AS (
      |  SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |    CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events)
      |SELECT day, event_type,
      |  COUNT(cents) AS n_events,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  CAST(SUM(cents * cents) AS BIGINT) AS sumsq_cents,
      |  CAST(MIN(cents) AS BIGINT) AS min_cents,
      |  CAST(MAX(cents) AS BIGINT) AS max_cents,
      |  CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(cents) AS DOUBLE) AS avg_cents,
      |  CAST(SUM(cents * cents) AS DOUBLE) / CAST(COUNT(cents) AS DOUBLE)
      |    - (CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(cents) AS DOUBLE))
      |      * (CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(cents) AS DOUBLE))
      |    AS var_cents
      |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin) { (spark, dir) =>
    import graft.ops.MvOps
    val cutoff = lit("2024-01-24").cast("date")
    val ev = Tables.events(spark, dir)
      .withColumn("day", date_trunc("day", col("ts")).cast("date"))
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
    val keys = Seq("day", "event_type")
    // stored half: base-period state persisted as a day-bucketed
    // catalog table (rebuilt here so the certified surface includes
    // the build; in production it is written once and only appended)
    val tbl = "graft_mv_base"
    graft.sinks.Sinks.replaceBucketedTable(
      MvOps.aggState(ev.filter(col("day") < cutoff), keys, col("cents")),
      tbl, Seq("day"), 8)
    // delta half: only the tail week is scanned
    val delta = MvOps.aggState(ev.filter(col("day") >= cutoff), keys, col("cents"))
    MvOps.finalizeState(MvOps.mergeStates(keys, spark.table(tbl), delta))
      .select(col("day"), col("event_type"),
        col("mv_n").as("n_events"), col("mv_s").as("sum_cents"),
        col("mv_s2").as("sumsq_cents"), col("mv_mn").as("min_cents"),
        col("mv_mx").as("max_cents"), col("mv_avg").as("avg_cents"),
        col("mv_var").as("var_cents"))
      .orderBy(col("day"), col("event_type"))
  }

  /** Transparent aggregate-over-MV rewrite
    * ([[graft.plans.MvRewrite]]) — the OPTIMIZER half of the MV story
    * ([[q_mv_incremental]] is the maintenance half): the rollup is
    * stored once as a catalog table and REGISTERED, and the certified
    * query is the plain user aggregate over the BASE lineitem scan —
    * Catalyst answers it from the MV (the executed plan scans
    * `graft_mv_lineitem_rollup`, not lineitem — plan-asserted in
    * MvRewriteSpec and PlanSpec) while the DuckDB oracle computes the
    * same aggregate from the base table, certifying the rewrite
    * changes the plan and not the answer. At 100 TB this is a
    * dashboard refresh reading a bounded rollup instead of re-scanning
    * the fact table, with zero query changes.
    */
  /** Maintenance side shared by the MV-rewrite family: store + register
    * the lineitem rollup (in production written once and incrementally
    * maintained; rebuilt here so the certified surface includes the
    * build). `replaceTable` deregisters EVERY registration served from
    * the table first (round-9 advice: a prior SF dir's mapping onto the
    * just-overwritten table is a silent wrong answer — and a surviving
    * same-dir mapping would rewrite the rebuild itself into a read of
    * the MV it is about to overwrite).
    */
  private val mvRollupName = "graft_mv_lineitem_rollup"

  private def registeredLineitemRollup(
      spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
    import graft.plans.MvRewrite
    val rollup = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_price"),
        count(lit(1)).as("cnt"),
        // per-measure NON-NULL counts: AVG(x)'s divisor is COUNT(x),
        // never COUNT(*) — storing them next to the sums is what makes
        // AVG derivable from the rollup (MvDef.avgCounts)
        count(col("l_quantity")).as("cnt_qty"),
        count(col("l_extendedprice")).as("cnt_price"))
    graft.sinks.Sinks.replaceTable(rollup, mvRollupName)
    MvRewrite.register(s"$dir/lineitem.parquet",
      MvRewrite.MvDef(mvRollupName, Seq("l_returnflag", "l_linestatus"),
        Map("l_quantity" -> "sum_qty", "l_extendedprice" -> "sum_price"),
        Some("cnt"),
        avgCounts = Map("l_quantity" -> "cnt_qty",
          "l_extendedprice" -> "cnt_price")))
    MvRewrite.install(spark)
    rollup
  }

  val q_mv_rewrite = QueryDef(
    "q_mv_rewrite",
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(sum_qty, 2) AS sum_qty,
      |  ROUND(sum_price, 2) AS sum_price,
      |  cnt
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |    SUM(l_quantity) AS sum_qty,
      |    SUM(l_extendedprice) AS sum_price,
      |    COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1, 2) t
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (spark, dir) =>
    val rollup = registeredLineitemRollup(spark, dir)
    // the USER query: an aggregate over the BASE table, transparently
    // answered from the MV by the injected rule
    rollup
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("sum_qty"), 2).as("sum_qty"),
        round(col("sum_price"), 2).as("sum_price"),
        col("cnt"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** COARSER-grain MV rewrite ([[graft.plans.MvRewrite]] round-10): the
    * user aggregate groups by a strict SUBSET of the rollup's keys
    * (l_returnflag alone vs the stored (l_returnflag, l_linestatus)
    * grain), and the rule answers it by RE-AGGREGATING the rollup —
    * SUM-of-sums, SUM(cnt) for COUNT(*) — instead of scanning lineitem
    * (plan-asserted in MvRewriteSpec/PlanSpec). The DuckDB oracle
    * computes the same aggregate from the base table, so the certificate
    * is exactly "re-aggregating mergeable state equals the base
    * aggregate". At 100 TB this is every coarser dashboard cut (by
    * flag, by day, by region) answered from ONE stored rollup at the
    * finest shared grain.
    */
  val q_mv_rewrite_grain = QueryDef(
    "q_mv_rewrite_grain",
    """SELECT l_returnflag,
      |  ROUND(sum_qty, 2) AS sum_qty,
      |  ROUND(sum_price, 2) AS sum_price,
      |  cnt
      |FROM (
      |  SELECT l_returnflag,
      |    SUM(l_quantity) AS sum_qty,
      |    SUM(l_extendedprice) AS sum_price,
      |    COUNT(*) AS cnt
      |  FROM lineitem GROUP BY 1) t
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    registeredLineitemRollup(spark, dir)
    // the USER query at the coarser grain, over the BASE table
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("sum_qty"),
        sum("l_extendedprice").as("sum_price"),
        count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        round(col("sum_qty"), 2).as("sum_qty"),
        round(col("sum_price"), 2).as("sum_price"),
        col("cnt"))
      .orderBy(col("l_returnflag"))
  }

  /** AVG over the MV rewrite ([[graft.plans.MvRewrite]] round-10): the
    * user asks `AVG(l_quantity), COUNT(l_quantity)` at the coarser
    * flag grain over the BASE table, and the rule derives the average
    * from the rollup's mergeable state — SUM(sum_qty) /
    * CAST(SUM(cnt_qty) AS DOUBLE), the IDENTICAL final division
    * Average itself evaluates, with COUNT(measure) (not COUNT(*)) as
    * the divisor so NULL-measure semantics are exact. The DuckDB
    * oracle computes the same aggregate from the base with the explicit
    * SUM/COUNT division, so the certificate is "the derived average
    * equals the base average" cross-engine; the executed plan scans
    * the rollup, never lineitem (PlanSpec). Output floor-quantized to
    * 1e-4 (ratio contract — the sums here are integer-valued doubles,
    * so the division inputs are bit-identical in both engines).
    */
  val q_mv_rewrite_avg = QueryDef(
    "q_mv_rewrite_avg",
    """SELECT l_returnflag,
      |  FLOOR((SUM(l_quantity) / COUNT(l_quantity)) * 10000 + 0.5)
      |    / 10000.0 AS avg_qty,
      |  CAST(COUNT(l_quantity) AS BIGINT) AS cnt_qty
      |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin) {
    (spark, dir) =>
    registeredLineitemRollup(spark, dir)
    // the USER query: AVG + COUNT(measure) over the BASE table at the
    // coarser grain, transparently answered from the rollup
    Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(avg("l_quantity").as("avg_raw"),
        count(col("l_quantity")).as("cnt_qty"))
      .select(col("l_returnflag"),
        (floor(col("avg_raw") * 10000 + 0.5) / 10000.0).as("avg_qty"),
        col("cnt_qty"))
      .orderBy(col("l_returnflag"))
  }

  /** FILTER-SUBSUMED MV rewrite ([[graft.plans.MvRewrite]] round-11):
    * the user aggregate carries a WHERE over MV KEY columns
    * (`l_returnflag <> 'N' AND l_linestatus IN ('F','O')`) and groups
    * by a coarser subset — the rule rebases the predicate onto the
    * rollup (key predicates select whole groups, so filtering the
    * rollup is exact for any deterministic key-only predicate) and
    * re-aggregates, never touching lineitem (plan-asserted in
    * MvRewriteSpec/PlanSpec). The DuckDB oracle runs the same filtered
    * aggregate over the BASE table, so the certificate is
    * "filter-then-rollup equals rollup-then-filter" cross-engine.
    * Non-key predicates (a measure, an unregistered column) refuse the
    * rewrite — spec-proven in MvRewriteSpec.
    */
  val q_mv_rewrite_filter = QueryDef(
    "q_mv_rewrite_filter",
    """SELECT l_returnflag,
      |  ROUND(sum_qty, 2) AS sum_qty,
      |  cnt
      |FROM (
      |  SELECT l_returnflag,
      |    SUM(l_quantity) AS sum_qty,
      |    COUNT(*) AS cnt
      |  FROM lineitem
      |  WHERE l_returnflag <> 'N' AND l_linestatus IN ('F', 'O')
      |  GROUP BY 1) t
      |ORDER BY l_returnflag""".stripMargin) { (spark, dir) =>
    registeredLineitemRollup(spark, dir)
    // the USER query: filtered aggregate over the BASE table — the
    // predicate references only MV key columns, so the rule answers
    // it from the rollup
    Tables.lineitem(spark, dir)
      .filter(col("l_returnflag") =!= "N" &&
        col("l_linestatus").isin("F", "O"))
      .groupBy(col("l_returnflag"))
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
      .select(col("l_returnflag"),
        round(col("sum_qty"), 2).as("sum_qty"), col("cnt"))
      .orderBy(col("l_returnflag"))
  }

  /** Skyline (Pareto frontier) over parts — cheapest-for-the-size
    * frontier: minimize price, maximize size, keep every point no
    * other point beats on both axes (ties on one axis allowed). The
    * engine is the partition-prune skyline: distinct (price, size)
    * points are hashed into buckets, each bucket's LOCAL skyline falls
    * out of one windowed prefix-max scan (sorted price asc / size
    * desc, a point survives iff its size strictly exceeds every
    * preceding point's), and only the bucket survivors — already
    * frontier-sized — meet in the final global scan. Dominance is
    * transitive, so local pruning never removes a global-frontier
    * point; at 100 TB the all-pairs NOT EXISTS the oracle states is
    * exactly what this shape avoids.
    */
  val q_skyline = QueryDef(
    "q_skyline",
    """WITH pts AS (
      |  SELECT CAST(ROUND(p_retailprice * 100) AS BIGINT) AS price_cents,
      |    CAST(p_size AS BIGINT) AS p_size,
      |    CAST(COUNT(*) AS BIGINT) AS n_parts
      |  FROM part GROUP BY 1, 2)
      |SELECT price_cents, p_size, n_parts FROM pts p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM pts q
      |  WHERE q.price_cents <= p.price_cents AND q.p_size >= p.p_size
      |    AND (q.price_cents < p.price_cents OR q.p_size > p.p_size))
      |ORDER BY price_cents""".stripMargin) { (spark, dir) =>
    import org.apache.spark.sql.expressions.Window
    def frontier(df: org.apache.spark.sql.DataFrame,
        parts: Seq[org.apache.spark.sql.Column]) = {
      // sorted (price asc, size desc), every possible dominator of a
      // point precedes it, and any dominator has size >= the point's
      // with either a strictly smaller price or a strictly larger
      // size — so on DISTINCT points, "size strictly above the prefix
      // max" is exactly non-dominance within the partition
      val w = Window.partitionBy(parts: _*)
        .orderBy(col("price_cents").asc, col("p_size").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("prefmax", max(col("p_size")).over(w))
        .filter(col("prefmax").isNull || col("p_size") > col("prefmax"))
        .drop("prefmax")
    }
    val pts = Tables.part(spark, dir)
      .groupBy(round(col("p_retailprice") * 100).cast("long").as("price_cents"),
        col("p_size").cast("long").as("p_size"))
      .agg(count(lit(1)).as("n_parts"))
    val local = frontier(
      pts.withColumn("bucket", pmod(hash(col("price_cents")), lit(32))),
      Seq(col("bucket"))).drop("bucket")
    // survivors are frontier-sized (≤ |distinct sizes|) — the single
    // partition of the global pass holds a bounded row count
    frontier(local, Seq.empty)
      .select(col("price_cents"), col("p_size"), col("n_parts"))
      .orderBy(col("price_cents"))
  }

  /** Band join (|x − y| ≤ ε) rewritten as a banded EQUI-join: customers
    * matched to suppliers within ±10.00 of account balance. Each
    * supplier cent-balance is exploded to its bucket and both
    * neighbors (bucket width = ε, so any in-band partner sits in a
    * neighboring bucket — integer DIV truncation keeps the property:
    * a ≤ε gap can never span two bucket boundaries), the join runs on
    * the bucket key, and the exact |Δ| ≤ ε mask removes the false
    * candidates. The oracle states the plain theta join DuckDB can
    * afford at this SF; at 100 TB the rewrite is the difference
    * between a shuffle join on `bucket` and a nested-loop cross
    * product. 3× expansion of the SMALL side only.
    */
  val q_band_join = QueryDef(
    "q_band_join",
    """WITH c AS (
      |  SELECT c_custkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cc
      |  FROM customer),
      |s AS (SELECT CAST(ROUND(s_acctbal * 100) AS BIGINT) AS sc
      |  FROM supplier),
      |m AS (
      |  SELECT c.c_custkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(MIN(ABS(c.cc - s.sc)) AS BIGINT) AS d
      |  FROM c JOIN s ON ABS(c.cc - s.sc) <= 1000
      |  GROUP BY 1)
      |SELECT c.c_custkey, COALESCE(m.n, 0) AS n_matches,
      |  m.d AS closest_diff_cents
      |FROM c LEFT JOIN m ON m.c_custkey = c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (spark, dir) =>
    val band = 1000L
    val cust = Tables.customer(spark, dir)
      .select(col("c_custkey"),
        round(col("c_acctbal") * 100).cast("long").as("cc"))
    val supp = Tables.supplier(spark, dir)
      .select(round(col("s_acctbal") * 100).cast("long").as("sc"))
      .withColumn("sb", expr(s"sc DIV $band"))
      .select(col("sc"), explode(array(col("sb") - 1, col("sb"),
        col("sb") + 1)).as("bucket"))
    val matches = cust
      .withColumn("bucket", expr(s"cc DIV $band"))
      .join(supp, "bucket")
      .filter(abs(col("cc") - col("sc")) <= band)
      .groupBy(col("c_custkey"))
      .agg(count(lit(1)).as("n"), min(abs(col("cc") - col("sc"))).as("d"))
    cust.join(matches, Seq("c_custkey"), "left")
      .select(col("c_custkey"), coalesce(col("n"), lit(0L)).as("n_matches"),
        col("d").as("closest_diff_cents"))
      .orderBy(col("c_custkey"))
  }

  val all: Seq[QueryDef] = Seq(
    q_bloom_join, q_quantile_sketch, q_zorder_tiles, q_table_profile,
    q_table_profile_sketch, q_interval_join, q_table_checksum, q_global_bins,
    q_interval_overlap, q_mv_incremental, q_mv_rewrite, q_mv_rewrite_grain,
    q_mv_rewrite_avg, q_mv_rewrite_filter, q_skyline, q_band_join)
}
