package graft.tools

import graft.ops.JoinOps
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Head-to-head of the two as-of join plans on a synthetic series far
  * larger than the sf0.1 events table (the 0.1-s-scale certified query
  * can't separate them): union+running-last window
  * ([[JoinOps.asofJoin]]) vs the native streaming-merge exec
  * ([[JoinOps.asofJoinNative]]). Same keys/timestamps, result
  * equality asserted on checksums before timing is reported.
  * Re-runnable: `runMain graft.tools.ProbeAsof [nLeft] [nRight]`.
  */
object ProbeAsof {
  def main(args: Array[String]): Unit = {
    val nLeft = args.headOption.map(_.toLong).getOrElse(5000000L)
    val nRight = args.drop(1).headOption.map(_.toLong).getOrElse(5000000L)
    val nKeys = 100000L
    val spark = graft.GraftSession.local("32", "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()

    // deterministic scattered (key, ts) series; ts globally unique per
    // side (scattered high bits + the unique id as low bits), so the
    // right side satisfies the unique-per-(key, ts) as-of contract
    def series(n: Long, salt: Long) = spark.range(n).select(
      pmod(col("id") * 2654435761L + salt, lit(nKeys)).as("k"),
      (pmod(col("id") * 40503L + salt * 7L, lit(1000000000L)) * (n + 1) +
        col("id")).as("ts"),
      col("id").as("payload"))
    val left = series(nLeft, 1L)
    val right = series(nRight, 2L)

    def checksum(df: org.apache.spark.sql.DataFrame): Long =
      df.select(coalesce(col("payload_r"), lit(-1L)).as("m"), col("payload"))
        .agg(sum(expr("m * 31 + payload"))).collect().head.getLong(0)

    def run(name: String,
        f: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      f().count() // warm
      val t0 = System.nanoTime()
      val cs = checksum(f())
      ((System.nanoTime() - t0) / 1e9, cs)
    }

    // both paths share the unique-names-apart-from-key contract
    val rightNat = right.select(col("k"), col("ts").as("rts"),
      col("payload").as("payload_r"))
    val (tWin, csWin) = run("window", () =>
      JoinOps.asofJoin(left, rightNat, "k", "ts", "rts", Seq("payload_r")))
    val (tNat, csNat) = run("native", () =>
      JoinOps.asofJoinNative(left, rightNat, "k", "ts", "rts",
        Seq("payload_r")))
    require(csWin == csNat, s"result mismatch: $csWin vs $csNat")
    println(f"asof probe: nLeft=$nLeft nRight=$nRight keys=$nKeys " +
      f"window=${tWin}%.2fs native=${tNat}%.2fs speedup=${tWin / tNat}%.2fx " +
      s"checksum=$csWin")

    // ---- directional merge (round 8): same inputs, direction flipped.
    // forward buffers nothing (its candidate is the lookahead row) so
    // it bounds the merge cost from below; nearest does backward's
    // buffering plus the lookahead compare. Checksums differ by
    // direction (different matches) but are deterministic — printed so
    // cross-run equality is checkable.
    val (tFwd, csFwd) = run("forward", () =>
      JoinOps.asofJoinNative(left, rightNat, "k", "ts", "rts",
        Seq("payload_r"), direction = "forward"))
    val (tNear, csNear) = run("nearest", () =>
      JoinOps.asofJoinNative(left, rightNat, "k", "ts", "rts",
        Seq("payload_r"), direction = "nearest"))
    println(f"asof direction probe: backward=${tNat}%.2fs " +
      f"forward=${tFwd}%.2fs nearest=${tNear}%.2fs " +
      s"checksums fwd=$csFwd near=$csNear")

    // bloom-pruned variant under a SELECTIVE left batch (the runtime-
    // filter regime: today's events touch 1% of the key space, the
    // history is full-width) — the win is right-side rows that never
    // reach the shuffle
    val selLeft = left.filter(col("k") < nKeys / 100)
    val selRightCs = (df: org.apache.spark.sql.DataFrame) =>
      checksum(df)
    def runSel(f: () => org.apache.spark.sql.DataFrame): (Double, Long) = {
      f().count()
      val t0 = System.nanoTime()
      val cs = selRightCs(f())
      graft.ops.Reuse.releaseAllCaches(spark)
      ((System.nanoTime() - t0) / 1e9, cs)
    }
    val (tSelPlain, csSelPlain) = runSel(() =>
      JoinOps.asofJoinNative(selLeft, rightNat, "k", "ts", "rts",
        Seq("payload_r")))
    val (tSelBloom, csSelBloom) = runSel(() =>
      JoinOps.asofJoinNativeBloom(selLeft, rightNat, "k", "ts", "rts",
        Seq("payload_r")))
    require(csSelPlain == csSelBloom,
      s"bloom result mismatch: $csSelPlain vs $csSelBloom")
    println(f"asof bloom probe (1%% selective left): " +
      f"plain=${tSelPlain}%.2fs bloom=${tSelBloom}%.2fs " +
      f"speedup=${tSelPlain / tSelBloom}%.2fx checksum=$csSelPlain")

    // ---- bucketed (feature-store) layout, round 8: both sides
    // persisted bucketed-by-key, so AsofJoinExec's clustered
    // requirement is met by the scans and the probe-time plan has NO
    // exchange. The write cost is paid once per history rebuild; the
    // number that matters operationally is the per-probe wall, which
    // drops by exactly the two shuffles. Result equality asserted
    // against the raw-frame native path's checksum.
    def persistBucketed(df: org.apache.spark.sql.DataFrame, t: String): Unit =
      graft.sinks.Sinks.replaceBucketedTable(df, t, Seq("k"), 32)
    val tW0 = System.nanoTime()
    persistBucketed(left, "probe_asof_left_b")
    persistBucketed(rightNat, "probe_asof_right_b")
    val tWrite = (System.nanoTime() - tW0) / 1e9
    val (tBuck, csBuck) = run("bucketed", () =>
      JoinOps.asofJoinNative(
        spark.table("probe_asof_left_b"), spark.table("probe_asof_right_b"),
        "k", "ts", "rts", Seq("payload_r")))
    require(csBuck == csNat, s"bucketed result mismatch: $csBuck vs $csNat")
    val bplan = JoinOps.asofJoinNative(
      spark.table("probe_asof_left_b"), spark.table("probe_asof_right_b"),
      "k", "ts", "rts", Seq("payload_r"))
      .queryExecution.executedPlan.toString
    require(!bplan.contains("Exchange hashpartitioning"),
      "bucketed asof probe unexpectedly shuffled")
    println(f"asof bucketed probe: write=${tWrite}%.2fs (once per rebuild) " +
      f"probe=${tBuck}%.2fs vs raw native=${tNat}%.2fs " +
      f"speedup=${tNat / tBuck}%.2fx exchange-free=true")
    spark.stop()
  }
}
