package graft.tools

import graft.ops.MvOps
import org.apache.spark.sql.functions._

/** Quantifies the incremental-MV claim (T145): maintaining the rollup
  * from stored state + a delta batch vs recomputing from the full fact
  * table, at a fact size where the difference is structural rather
  * than noise. The stored base state is built OUTSIDE the timed
  * region (that is the point of a materialized view — it already
  * exists when the batch lands); the timed incremental path is
  * delta-scan → state → merge (derive-stats is a fixed O(|groups|)
  * projection identical on both paths and excluded from both
  * timings). Result equality is asserted on checksums before any
  * timing is reported.
  * Re-runnable: `runMain graft.tools.ProbeMv [nRows] [deltaPct]`.
  */
object ProbeMv {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val deltaPct = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = graft.GraftSession.local("32", "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    val keys = Seq("day", "etype")

    // deterministic fact: 365 days × 8 types, delta = the last
    // `deltaPct`% of days (the "yesterday's ingest" regime)
    val cut = 365 - math.max(1, 365 * deltaPct / 100)
    def fact = spark.range(nRows).select(
      pmod(col("id") * 2654435761L, lit(365L)).as("day"),
      pmod(col("id") * 40503L, lit(8L)).as("etype"),
      (pmod(col("id") * 69069L, lit(200000L)) - 100000L).as("cents"))
    val work = java.nio.file.Files.createTempDirectory("graft_probe_mv_")
      .toString

    // untimed: the stored halves (raw delta partition as parquet — the
    // ingest file; base STATE as parquet — the materialized view)
    fact.filter(col("day") < cut).write.mode("overwrite")
      .parquet(s"$work/base_raw")
    fact.filter(col("day") >= cut).write.mode("overwrite")
      .parquet(s"$work/delta_raw")
    MvOps.aggState(spark.read.parquet(s"$work/base_raw"), keys, col("cents"))
      .write.mode("overwrite").parquet(s"$work/base_state")

    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(expr(
        "mv_n * 31 + mv_s * 17 + mv_s2 + mv_mn + mv_mx + day * 7 + etype")))
        .collect().head.getLong(0)

    def run(f: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      f().count() // warm the code paths; IO caches stay warm for both
      val t0 = System.nanoTime()
      val cs = checksum(f())
      ((System.nanoTime() - t0) / 1e9, cs)
    }

    // full recompute scans base_raw + delta_raw (what a nightly job
    // without stored state must do)
    val (tFull, csFull) = run(() => MvOps.aggState(
      spark.read.parquet(s"$work/base_raw")
        .unionByName(spark.read.parquet(s"$work/delta_raw")),
      keys, col("cents")))
    // incremental touches ONLY delta_raw + the |groups|-row state
    val (tInc, csInc) = run(() => MvOps.mergeStates(keys,
      spark.read.parquet(s"$work/base_state"),
      MvOps.aggState(spark.read.parquet(s"$work/delta_raw"), keys,
        col("cents")))
    )
    require(csFull == csInc, s"result mismatch: $csFull vs $csInc")
    println(f"mv probe: nRows=$nRows deltaPct=$deltaPct%% " +
      f"full=${tFull}%.2fs incremental=${tInc}%.2fs " +
      f"speedup=${tFull / tInc}%.2fx checksum=$csFull")
    spark.stop()
  }
}
