package graft.tools

import graft.ops.JoinOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** AQE-interaction audit for [[graft.plans.AsofJoinExec]]: partition
  * coalescing must treat the exec's two shuffles as one co-partitioned
  * group (as it does for SortMergeJoin) or the per-partition merge
  * would silently pair wrong buckets. This probe forces aggressive
  * coalescing (huge advisory size, tiny inputs of very different
  * sizes) and checks result equality against the window path plus the
  * executed plan's shuffle-read shape. Re-runnable:
  * `runMain graft.tools.ProbeAsofAqe`.
  */
object ProbeAsofAqe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.builder("local[8]", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "256m")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1b")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nKeys = 500L
    def series(n: Long, salt: Long) = spark.range(n).select(
      pmod(col("id") * 2654435761L + salt, lit(nKeys)).as("k"),
      (pmod(col("id") * 40503L + salt * 7L, lit(1000000000L)) * (n + 1) +
        col("id")).as("ts"),
      col("id").as("payload"))
    // asymmetric sizes → different per-side partition byte sizes →
    // maximal chance of divergent coalescing if sides were independent
    val left = series(300000L, 1L)
    val rightNat = series(3000L, 2L).select(col("k"),
      col("ts").as("rts"), col("payload").as("payload_r"))
    def cs(df: org.apache.spark.sql.DataFrame) =
      df.select(coalesce(col("payload_r"), lit(-1L)).as("m"), col("payload"))
        .agg(sum(expr("m*31+payload"))).collect().head.getLong(0)
    val win = cs(JoinOps.asofJoin(left, rightNat, "k", "ts", "rts", Seq("payload_r")))
    val natDf = JoinOps.asofJoinNative(left, rightNat, "k", "ts", "rts", Seq("payload_r"))
    val nat = cs(natDf)
    val plan = natDf.queryExecution.executedPlan.toString
    val reads = "AQEShuffleRead".r.findAllIn(plan).length
    println(s"asof-aqe probe: window=$win native=$nat match=${win == nat} " +
      s"aqeShuffleReads=$reads coalesced=${plan.contains("coalesced")}")
    require(win == nat, "NATIVE ASOF DIVERGES UNDER AQE COALESCING")
    spark.stop()
  }
}
