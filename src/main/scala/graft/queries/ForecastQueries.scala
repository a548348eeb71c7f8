package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.ForecastOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Forecasting query surface (M4–M7): distributed Holt-Winters per
  * event_type over daily counts, plus the high-risk alert extraction.
  *
  * Even this iterative model is oracle-checked: the per-step smoothing
  * recurrence runs as a DuckDB RECURSIVE CTE carrying (level, trend,
  * season-list, Σresid²) state, with `list_reduce` left-folds wherever
  * Scala folds left — generated from the SAME α/β/γ/season constants
  * as the engine (`ForecastOps`), so the recurrence algebra itself is
  * certified, not just row counts. ForecastOpsSpec keeps the
  * independent property checks.
  */
object ForecastQueries {

  private def dailyByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type").as("group_key"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** The full Holt-Winters pipeline as DuckDB SQL (ending in CTE `hw`).
    * Literal subtleties: smoothing constants are CAST AS DOUBLE
    * (DuckDB parses bare `0.3` as DECIMAL, whose arithmetic diverges
    * from the engine's double math) and complements are written
    * `(1 - α)` exactly as the Scala computes them (the double
    * `1 - 0.3` is NOT the double literal `0.7`).
    */
  private def hwSqlCtes(horizon: Int): String = {
    val m = ForecastOps.Season
    val a = s"CAST(${ForecastOps.Alpha} AS DOUBLE)"
    val b = s"CAST(${ForecastOps.Beta} AS DOUBLE)"
    val g = s"CAST(${ForecastOps.Gamma} AS DOUBLE)"
    // newLevel expression, repeated textually where the step needs it
    // twice (identical expression → identical IEEE value)
    val y = s"series[t + 1]"
    val s0 = s"season[(t % $m) + 1]"
    val nl = s"($a * ($y - $s0) + (1 - $a) * (level + trend))"
    s"""daily AS (
       |  SELECT event_type AS group_key, CAST(date_trunc('day', ts) AS DATE) AS day,
       |    COUNT(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |bounds AS (
       |  SELECT group_key, MIN(day) AS first_day, MAX(day) AS last_day,
       |    CAST(date_diff('day', MIN(day), MAX(day)) AS INT) + 1 AS n
       |  FROM daily GROUP BY 1 HAVING COUNT(*) >= ${ForecastOps.MinHistory}),
       |dense AS (
       |  SELECT b.group_key, b.last_day, b.n,
       |    list(CAST(COALESCE(d.cnt, 0) AS DOUBLE) ORDER BY gs.g) AS series
       |  FROM bounds b
       |  CROSS JOIN UNNEST(range(0, b.n)) gs(g)
       |  LEFT JOIN daily d ON d.group_key = b.group_key
       |    AND d.day = b.first_day + CAST(gs.g AS INT)
       |  GROUP BY b.group_key, b.last_day, b.n),
       |init1 AS (
       |  SELECT *, n >= ${2 * m} AS use_season,
       |    CASE WHEN n >= ${2 * m} THEN list_reduce(series[1:$m], (a, b) -> a + b) / $m.0
       |         ELSE series[1] END AS init_level
       |  FROM dense),
       |init2 AS (
       |  SELECT *,
       |    CASE WHEN n >= ${2 * m} THEN
       |        list_reduce(list_transform(range(0, $m),
       |          i -> (series[i + ${m + 1}] - series[i + 1]) / CAST($m AS DOUBLE)),
       |          (a, b) -> a + b) / $m.0
       |      WHEN n > 1 THEN (series[n] - series[1]) / CAST(n - 1 AS DOUBLE)
       |      ELSE CAST(0 AS DOUBLE) END AS init_trend,
       |    list_transform(range(0, $m),
       |      i -> CASE WHEN n >= ${2 * m} THEN series[i + 1] - init_level
       |                ELSE CAST(0 AS DOUBLE) END) AS season0
       |  FROM init1),
       |rec AS (
       |  SELECT group_key, last_day, n, series, use_season,
       |    0 AS t, init_level AS level, init_trend AS trend, season0 AS season,
       |    CAST(0 AS DOUBLE) AS sumsq
       |  FROM init2
       |  UNION ALL
       |  SELECT group_key, last_day, n, series, use_season,
       |    t + 1,
       |    $nl AS level,
       |    $b * ($nl - level) + (1 - $b) * trend AS trend,
       |    list_transform(range(0, $m), i ->
       |      CASE WHEN use_season AND i = t % $m THEN
       |        $g * ($y - $nl) + (1 - $g) * season[i + 1]
       |      ELSE season[i + 1] END) AS season,
       |    sumsq + ($y - (level + trend + $s0)) * ($y - (level + trend + $s0)) AS sumsq
       |  FROM rec WHERE t < n),
       |fitted AS (
       |  SELECT group_key, last_day, n, series, use_season, level, trend, season,
       |    sqrt(sumsq / GREATEST(n, 1)) AS resid,
       |    list_reduce(series, (a, b) -> a + b) / n AS hist_mean
       |  FROM rec WHERE t = n),
       |hist AS (
       |  SELECT *, sqrt(list_reduce(list_transform(series,
       |      v -> (v - hist_mean) * (v - hist_mean)), (a, b) -> a + b) / n) AS hist_std
       |  FROM fitted),
       |fc AS (
       |  SELECT group_key, last_day, use_season,
       |    CAST(h AS INT) AS h,
       |    GREATEST(CAST(0 AS DOUBLE),
       |      (level + CAST(h AS INT) * trend) + season[((n + CAST(h AS INT) - 1) % $m) + 1]) AS pred,
       |    resid, hist_mean,
       |    CASE WHEN hist_std > 0 THEN hist_std ELSE CAST(1 AS DOUBLE) END AS safe_std
       |  FROM hist CROSS JOIN UNNEST(range(1, ${horizon + 1})) hs(h)),
       |hw AS (
       |  SELECT group_key,
       |    last_day + h AS day,
       |    ROUND(pred, 4) AS predicted,
       |    ROUND(GREATEST(CAST(0 AS DOUBLE), pred - 1.96 * resid), 4) AS lower_bound,
       |    ROUND(pred + 1.96 * resid, 4) AS upper_bound,
       |    CASE WHEN use_season THEN 'holt_winters' ELSE 'ses_trend' END AS method,
       |    CASE WHEN (pred - hist_mean) / safe_std > 2.5 THEN 'CRITICAL'
       |         WHEN (pred - hist_mean) / safe_std > 1.5 THEN 'HIGH'
       |         WHEN (pred - hist_mean) / safe_std > 0.5 THEN 'MODERATE'
       |         ELSE 'LOW' END AS risk_level
       |  FROM fc)""".stripMargin
  }

  /** 14-day Holt-Winters forecast per event type (replaces the
    * reference's driver-side Prophet loop with `flatMapGroups`). */
  val q_forecast_hw = QueryDef(
    "q_forecast_hw",
    s"""WITH RECURSIVE ${hwSqlCtes(14)}
       |SELECT * FROM hw ORDER BY group_key, day""".stripMargin) { (spark, dir) =>
    ForecastOps.holtWintersForecast(dailyByType(spark, dir), 14)
      .toDF()
      .orderBy(col("group_key"), col("day"))
  }

  /** Alert extraction over the forecast (M7). */
  val q_forecast_alerts = QueryDef(
    "q_forecast_alerts",
    s"""WITH RECURSIVE ${hwSqlCtes(14)}
       |SELECT group_key, COUNT(*) AS n_alert_days, MIN(day) AS first_alert_day,
       |  MAX(predicted) AS max_predicted
       |FROM hw WHERE risk_level IN ('HIGH', 'CRITICAL')
       |GROUP BY group_key
       |ORDER BY max_predicted DESC, group_key""".stripMargin) { (spark, dir) =>
    ForecastOps.alerts(
      ForecastOps.holtWintersForecast(dailyByType(spark, dir), 14))
  }

  /** Split-conformal prediction intervals, backtested on the last 7
    * days per event type: base forecaster = seasonal-naive (ŷ_d =
    * y_{d−7} on the dense daily grid), calibration set = every
    * earlier day with a lag-7 predecessor, and the interval half-width
    * is the finite-sample conformal quantile — the
    * ⌈(n+1)(1−α)⌉-th smallest absolute residual (α = 0.1), which
    * guarantees ≥ 90% marginal coverage under exchangeability with NO
    * distributional assumption. That wrapper property — intervals
    * from empirical residual quantiles, not a Gaussian ±1.96σ like
    * [[q_forecast_hw]] — is exactly what this operator certifies:
    * daily counts are integers, residuals are integers, the quantile
    * is an exact order statistic (`⌈·⌉` as `(9·(n+1)+9)//10`), so the
    * whole interval construction replays bit-identically in DuckDB.
    * Scale shape: dense grid via per-type sequence+explode (the
    * resample pattern, zero extra shuffles), lag-7 as a per-type
    * window, per-type calibration aggregate broadcast back — nothing
    * global, types are the parallelism unit.
    */
  val q_forecast_conformal = QueryDef(
    "q_forecast_conformal",
    """WITH daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |bounds AS (
      |  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1,
      |    CAST(date_diff('day', MIN(day), MAX(day)) AS BIGINT) + 1 AS n
      |  FROM daily GROUP BY 1),
      |grid AS (
      |  SELECT b.event_type, b.d0 + CAST(gs.g AS INT) AS day,
      |    b.d1 - 6 AS cutoff
      |  FROM bounds b CROSS JOIN UNNEST(range(0, b.n)) gs(g)),
      |dense AS (
      |  SELECT g.event_type, g.day, g.cutoff,
      |    COALESCE(d.cnt, 0) AS y,
      |    LAG(COALESCE(d.cnt, 0), 7) OVER (
      |      PARTITION BY g.event_type ORDER BY g.day) AS yhat
      |  FROM grid g LEFT JOIN daily d
      |    ON d.event_type = g.event_type AND d.day = g.day),
      |calib AS (
      |  SELECT event_type, ABS(y - yhat) AS r
      |  FROM dense WHERE yhat IS NOT NULL AND day < cutoff),
      |qk AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_cal,
      |    LEAST((9 * (COUNT(*) + 1) + 9) // 10, COUNT(*)) AS k
      |  FROM calib GROUP BY 1),
      |ranked AS (
      |  SELECT c.event_type, c.r,
      |    ROW_NUMBER() OVER (PARTITION BY c.event_type ORDER BY c.r) AS rn
      |  FROM calib c),
      |qv AS (
      |  SELECT r.event_type, q.n_cal, CAST(r.r AS BIGINT) AS q
      |  FROM ranked r JOIN qk q ON q.event_type = r.event_type AND r.rn = q.k)
      |SELECT d.event_type, d.day, d.y AS actual, CAST(d.yhat AS BIGINT) AS pred,
      |  CAST(d.yhat - v.q AS BIGINT) AS lo, CAST(d.yhat + v.q AS BIGINT) AS hi,
      |  (d.y BETWEEN d.yhat - v.q AND d.yhat + v.q) AS covered,
      |  v.n_cal, v.q AS q_width
      |FROM dense d JOIN qv v ON v.event_type = d.event_type
      |WHERE d.day >= d.cutoff
      |ORDER BY d.event_type, d.day""".stripMargin) { (spark, dir) =>
    conformalReadoff(
      Tables.events(spark, dir)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("cnt")))
  }

  /** Conformal-interval read-off over an aggregated (event_type, day,
    * cnt) daily table — shared by [[q_forecast_conformal]] (batch
    * build) and the streaming q_stream_conformal (micro-batch-
    * accumulated build): per-day counts are a plain mergeable SUM, so
    * the interval construction must be invariant to HOW the counts
    * were accumulated — the same batch-cut-invariance contract as
    * [[graft.queries.DqQueries.ksReadoff]].
    */
  def conformalReadoff(daily: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bounds = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = bounds
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"),
        date_sub(col("d1"), 6).as("cutoff"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    // the grid side derives FROM daily, so joining daily back against
    // it presents the same attribute ids on both sides; re-aliasing
    // mints fresh ids (each Alias is a new exprId) and keeps the join
    // resolvable even when `daily` is a drained temp view (the
    // streaming path hit INTERNAL_ERROR conflicting-references here)
    val d2 = daily.select(col("event_type").as("d_type"),
      col("day").as("d_day"), col("cnt").as("d_cnt"))
    val dense = grid.join(d2,
        col("event_type") === col("d_type") && col("day") === col("d_day"),
        "left")
      .select(col("event_type"), col("day"), col("cutoff"),
        coalesce(col("d_cnt"), lit(0L)).as("y"))
      .withColumn("yhat", lag(col("y"), 7).over(w))
    val calib = dense
      .filter(col("yhat").isNotNull && col("day") < col("cutoff"))
      .select(col("event_type"), abs(col("y") - col("yhat")).as("r"))
    val qk = calib.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_cal"),
        least(expr("(9 * (count(1) + 1) + 9) DIV 10"), count(lit(1))).as("k"))
    val ranked = calib.withColumn("rn",
      row_number().over(Window.partitionBy(col("event_type"))
        .orderBy(col("r"))).cast("long"))
    val qk2 = qk.select(col("event_type").as("q_type"),
      col("n_cal").as("n_cal"), col("k").as("k"))
    val qv = ranked.join(broadcast(qk2),
        col("event_type") === col("q_type") && col("rn") === col("k"))
      .select(col("event_type"), col("n_cal"), col("r").cast("long").as("q"))
    val qv2 = qv.select(col("event_type").as("v_type"),
      col("n_cal").as("n_cal"), col("q").as("q"))
    dense.filter(col("day") >= col("cutoff"))
      .join(broadcast(qv2), col("event_type") === col("v_type"))
      .select(col("event_type"), col("day"), col("y").as("actual"),
        col("yhat").cast("long").as("pred"),
        (col("yhat") - col("q")).cast("long").as("lo"),
        (col("yhat") + col("q")).cast("long").as("hi"),
        (col("y") >= col("yhat") - col("q") &&
          col("y") <= col("yhat") + col("q")).as("covered"),
        col("n_cal"), col("q").as("q_width"))
      .orderBy(col("event_type"), col("day"))
  }

  val all: Seq[QueryDef] =
    Seq(q_forecast_hw, q_forecast_alerts, q_forecast_conformal)
}
