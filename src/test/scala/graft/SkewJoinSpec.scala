package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE skew-join certification — the automatic path a 100 TB deploy
  * actually leans on (q_salted_agg certifies MANUAL salting; this
  * certifies that Spark's adaptive runtime splits a skewed sort-merge
  * partition on its own AND that the split result is still exactly
  * correct).
  *
  * The thresholds are lowered to test scale (a 64 KB "skewed"
  * partition) — the mechanism is identical at production thresholds;
  * only the byte constants differ. Confs are saved/restored so the
  * shared test session stays pristine for sibling specs.
  */
class SkewJoinSpec extends AnyFunSuite {
  import TestSpark._

  private val tuning = Seq(
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    // a partition is "skewed" when > factor × median AND > threshold
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32k",
    // force a shuffled SMJ — a broadcast join has no skewed shuffle to split
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")

  test("AQE splits the skewed partition of a hot-key join; result exactly correct") {
    val saved = tuning.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      tuning.foreach { case (k, v) => spark.conf.set(k, v) }
      val nHot = 20000L
      val nColdKeys = 99L
      val perCold = 20L
      val rightPerKey = 7L
      // left: ONE hot key (0) carrying nHot rows ≫ everything else,
      // plus 99 cold keys; a payload column makes partition bytes real
      val left = spark.range(nHot).select(lit(0L).as("k"), col("id").as("lv"))
        .unionAll(spark.range(nColdKeys * perCold).select(
          (col("id") % nColdKeys + 1L).as("k"), col("id").as("lv")))
        .withColumn("pad", lpad(col("lv").cast("string"), 48, "x"))
      val right = spark.range((nColdKeys + 1L) * rightPerKey).select(
        (col("id") % (nColdKeys + 1L)).as("k"), col("id").as("rv"))
      val joined = left.join(right, "k")
      // materialize THIS dataframe's own query execution — count()
      // would plan a separate aggregate execution and leave joined's
      // adaptive plan unexecuted (isFinalPlan=false)
      val total = joined.collect().length.toLong
      // exact oracle, computed independently: every left row matches
      // exactly rightPerKey right rows
      assert(total === (nHot + nColdKeys * perCold) * rightPerKey)
      // the FINAL adaptive plan must have split the hot partition —
      // Spark marks both the join and its shuffle reads with the skew
      // flag; if AQE silently stops splitting, this line fails
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        "adaptive plan did not mark a skew-join split:\n" + plan.take(2000))
      // and a per-key probe survives the split exactly (no dup/lost
      // rows inside the replicated partition)
      val hot = joined.filter(col("k") === 0L).count()
      assert(hot === nHot * rightPerKey)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
