package graft

import java.time.LocalDate

import graft.ops.ForecastOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract properties mirroring the reference forecast guarantees:
  * horizon length, clip >= 0, ordered CI bounds, min-history gate,
  * risk-ladder boundaries (`disease_outbreak_forecaster.py:59,84-86,
  * 128-145`). Property inputs are generated from a fixed-seed RNG
  * (scalacheck-style sweep without the scalatestplus bridge).
  */
class ForecastOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("forecast has full horizon, non-negative preds, ordered CI") {
    val rng = new scala.util.Random(42)
    for (_ <- 1 to 100) {
      val n = 7 + rng.nextInt(54)
      val series = Array.fill(n)(rng.nextDouble() * 100.0)
      val rows = ForecastOps.forecastSeries(
        "g", LocalDate.of(2024, 1, 31), series, 14)
      assert(rows.length === 14)
      rows.foreach { r =>
        assert(r.predicted >= 0.0)
        assert(r.lower_bound <= r.predicted + 1e-9)
        assert(r.upper_bound >= r.predicted - 1e-9)
        assert(Set("LOW", "MODERATE", "HIGH", "CRITICAL").contains(r.risk_level))
      }
      val days = rows.map(_.day.toLocalDate.toEpochDay)
      assert(days === (1 to 14).map(LocalDate.of(2024, 1, 31).toEpochDay + _))
    }
  }

  test("constant series forecasts the constant with LOW risk") {
    val rows = ForecastOps.forecastSeries(
      "g", LocalDate.of(2024, 2, 1), Array.fill(28)(10.0), 7)
    rows.foreach { r =>
      assert(math.abs(r.predicted - 10.0) < 1.0)
      assert(r.risk_level === "LOW")
    }
  }

  test("min-history gate drops short groups") {
    val spark0 = spark
    import spark0.implicits._
    val daily = Seq(
      ("short", java.sql.Date.valueOf("2024-01-01"), 5L),
      ("short", java.sql.Date.valueOf("2024-01-02"), 6L))
      .toDF("group_key", "day", "cnt")
    assert(ForecastOps.holtWintersForecast(daily, 14).count() === 0)
  }

  test("distributed forecast matches the local path per group") {
    val daily = Tables.events(spark, sf)
      .groupBy(col("event_type").as("group_key"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))
    val dist = ForecastOps.holtWintersForecast(daily, 14).collect()
      .groupBy(_.group_key)
    val local = daily.collect().groupBy(_.getString(0)).map { case (k, rows) =>
      val pts = rows.map(r => (r.getDate(1).toLocalDate, r.getLong(2)))
        .sortBy(_._1.toEpochDay)
      val first = pts.head._1
      val last = pts.last._1
      val series = new Array[Double]((last.toEpochDay - first.toEpochDay).toInt + 1)
      pts.foreach { case (d, c) => series((d.toEpochDay - first.toEpochDay).toInt) = c.toDouble }
      k -> ForecastOps.forecastSeries(k, last, series, 14)
    }
    assert(dist.keySet === local.keySet)
    dist.foreach { case (k, rows) =>
      val got = rows.sortBy(_.day.toLocalDate.toEpochDay).map(_.predicted).toSeq
      val want = local(k).map(_.predicted)
      assert(got === want)
    }
  }
}
