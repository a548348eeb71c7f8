package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.ForecastOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Forecasting query surface (M4–M7): distributed Holt-Winters per
  * event_type over daily counts, plus the high-risk alert extraction.
  * Not ANSI-SQL-expressible → rows-only driver check; semantics are
  * property-tested in ForecastOpsSpec.
  */
object ForecastQueries {

  private def dailyByType(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .groupBy(col("event_type").as("group_key"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(count(lit(1)).as("cnt"))

  /** 14-day Holt-Winters forecast per event type (replaces the
    * reference's driver-side Prophet loop with `flatMapGroups`). */
  val q_forecast_hw = QueryDef.noOracle("q_forecast_hw") { (spark, dir) =>
    ForecastOps.holtWintersForecast(dailyByType(spark, dir), 14)
      .toDF()
      .orderBy(col("group_key"), col("day"))
  }

  /** Alert extraction over the forecast (M7). */
  val q_forecast_alerts = QueryDef.noOracle("q_forecast_alerts") { (spark, dir) =>
    ForecastOps.alerts(
      ForecastOps.holtWintersForecast(dailyByType(spark, dir), 14))
  }

  val all: Seq[QueryDef] = Seq(q_forecast_hw, q_forecast_alerts)
}
