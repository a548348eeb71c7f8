package graft.ops

import java.sql.Date
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Output row contract mirroring the reference forecast schema
  * (`disease_outbreak_forecaster.py:39-51`): per (group, horizon day)
  * prediction with CI bounds, the method that produced it, and the
  * outbreak-risk label.
  */
case class ForecastRow(
    group_key: String,
    day: Date,
    predicted: Double,
    lower_bound: Double,
    upper_bound: Double,
    method: String,
    risk_level: String)

private case class DailyPoint(group_key: String, day: Date, cnt: Long)

/** Distributed per-group time-series forecasting — the engine's
  * replacement for the reference's driver-side Prophet/SARIMA loop
  * (`disease_outbreak_forecaster.py:328-398`, the toPandas collect at
  * `:344` is the anti-pattern being eliminated): each group's history
  * stays on its executor via `groupByKey(...).flatMapGroups`, so
  * forecasting 10⁶ groups scales horizontally with zero driver state.
  *
  * Model: additive Holt-Winters (level + trend + weekly season, m=7) —
  * deterministic, dependency-free, same contract as the reference
  * (min-history gate, clip >= 0 `disease_outbreak_forecaster.py:84-86`,
  * risk ladder `:138-142`, CI from residual spread).
  */
object ForecastOps {

  val Season = 7
  val MinHistory = 7 // reference gate: >= 7 points (`:59`)
  val Alpha = 0.3
  val Beta = 0.1
  val Gamma = 0.2

  /** Forecast `horizon` days per group from a (group_key, day, cnt)
    * daily-counts frame. Missing days inside each group's range are
    * zero-filled (absence of events is observed zero, not missing
    * data).
    */
  def holtWintersForecast(daily: DataFrame, horizon: Int): Dataset[ForecastRow] = {
    val ss = daily.sparkSession
    import ss.implicits._
    daily
      .select(col("group_key").cast("string"), col("day").cast("date"),
        col("cnt").cast("long"))
      .as[DailyPoint]
      .groupByKey(_.group_key)
      .flatMapGroups { (key, it) =>
        // secondary sort on cnt: duplicate (key, day) rows otherwise
        // resolve last-write-wins in shuffle-iterator order, which is
        // nondeterministic across runs (duplicates shouldn't occur —
        // the upstream is a daily aggregate — but determinism must not
        // depend on that)
        val pts = it.toArray.sortBy(p => (p.day.toLocalDate.toEpochDay, p.cnt))
        if (pts.length < MinHistory) Iterator.empty
        else {
          val first = pts.head.day.toLocalDate
          val last = pts.last.day.toLocalDate
          val nDays = (last.toEpochDay - first.toEpochDay).toInt + 1
          val series = new Array[Double](nDays)
          pts.foreach { p =>
            series((p.day.toLocalDate.toEpochDay - first.toEpochDay).toInt) = p.cnt.toDouble
          }
          forecastSeries(key, last, series, horizon).iterator
        }
      }
  }

  /** Pure deterministic Holt-Winters fit + forecast on a dense series.
    * Exposed for property tests.
    */
  def forecastSeries(
      key: String, lastDay: LocalDate, series: Array[Double],
      horizon: Int): Seq[ForecastRow] = {
    val n = series.length
    val m = Season
    val method = if (n >= 2 * m) "holt_winters" else "ses_trend"

    // init: level = mean of first season, trend = mean first-diff across
    // seasons (or simple diff), season = first-season deviations
    val useSeason = n >= 2 * m
    val initLevel =
      if (useSeason) series.take(m).sum / m else series.head
    val initTrend =
      if (useSeason) (0 until m).map(i => (series(m + i) - series(i)) / m).sum / m
      else if (n > 1) (series(n - 1) - series.head) / (n - 1)
      else 0.0
    val season = Array.tabulate(m)(i => if (useSeason) series(i) - initLevel else 0.0)

    var level = initLevel
    var trend = initTrend
    var sumSq = 0.0
    var nRes = 0
    for (t <- 0 until n) {
      val s = season(t % m)
      val fit = level + trend + s
      val y = series(t)
      sumSq += (y - fit) * (y - fit)
      nRes += 1
      val newLevel = Alpha * (y - s) + (1 - Alpha) * (level + trend)
      trend = Beta * (newLevel - level) + (1 - Beta) * trend
      if (useSeason) season(t % m) = Gamma * (y - newLevel) + (1 - Gamma) * s
      level = newLevel
    }
    val resid = math.sqrt(sumSq / math.max(nRes, 1))

    val histMean = series.sum / n
    val histStd = math.sqrt(series.map(v => (v - histMean) * (v - histMean)).sum / n)

    (1 to horizon).map { h =>
      val raw = level + h * trend + season((n + h - 1) % m)
      val pred = math.max(0.0, raw)
      // risk ladder vs historical distribution
      // (`disease_outbreak_forecaster.py:128-145`; the reference's
      // zero-variance guard substitutes std = 1.0)
      val safeStd = if (histStd > 0) histStd else 1.0
      val z = (pred - histMean) / safeStd
      val risk =
        if (z > 2.5) "CRITICAL"
        else if (z > 1.5) "HIGH"
        else if (z > 0.5) "MODERATE"
        else "LOW"
      ForecastRow(
        key,
        Date.valueOf(lastDay.plusDays(h)),
        round4(pred),
        round4(math.max(0.0, pred - 1.96 * resid)),
        round4(pred + 1.96 * resid),
        method,
        risk)
    }
  }

  private def round4(x: Double): Double = math.rint(x * 10000) / 10000

  /** High-risk alert extraction (M7, `disease_outbreak_forecaster.py:
    * 428-453`): per group, first alert day / peak prediction among
    * HIGH/CRITICAL rows.
    */
  def alerts(forecast: Dataset[ForecastRow]): DataFrame =
    forecast.toDF()
      .filter(col("risk_level").isin("HIGH", "CRITICAL"))
      .groupBy(col("group_key"))
      .agg(count(lit(1)).as("n_alert_days"),
        min(col("day")).as("first_alert_day"),
        max(col("predicted")).as("max_predicted"))
      .orderBy(desc("max_predicted"), col("group_key"))
}
