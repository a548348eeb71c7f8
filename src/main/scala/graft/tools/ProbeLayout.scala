package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Measures what the z-order layout operator (q_zorder_tiles /
  * ScaleQueries.withMortonZ) actually buys at the STORAGE layer: bytes
  * read by a selective 2-D range scan over lineitem persisted (a)
  * shuffled, (b) sorted by one key only, (c) z-ordered on
  * (l_partkey, l_suppkey) — small parquet row groups so min/max stats
  * have pruning resolution, bytes observed via the task InputMetrics.
  * Row-group skipping from column stats is exactly the mechanism that
  * turns layout into scan cost at 100 TB; this probe turns the
  * ScaleOpsSpec bounding-box assertion into measured I/O.
  *
  * Usage: runMain graft.tools.ProbeLayout [sfDir]
  */
object ProbeLayout {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.GraftSession.local("32", "ERROR")
    val bytes = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.inputMetrics.bytesRead)
    })

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey"),
        col("l_quantity").cast("double").as("l_quantity"))
    // scale both keys onto the FULL 16-bit grid — raw TPC-H keys live
    // in the low corner (partkey<=20k, suppkey<=1k of 65536), where a
    // z-prefix tiling has no resolution over the actual data range
    val mx = li.agg(max(col("l_partkey")), max(col("l_suppkey"))).head()
    val (pMax, sMax) = (mx.getLong(0), mx.getLong(1))
    val keyed = graft.queries.ScaleQueries.withMortonZ(
      li.withColumn("xq", col("l_partkey") * 65535L / pMax)
        .withColumn("yq", col("l_suppkey") * 65535L / sMax)
        .withColumn("xq", col("xq").cast("long"))
        .withColumn("yq", col("yq").cast("long")))
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"), col("z"))

    val work = java.nio.file.Files
      .createTempDirectory("graft_probe_layout_").toAbsolutePath.toString
    def write(tag: String, df: DataFrame): String = {
      val path = s"$work/$tag"
      df.coalesce(1).write
        .option("parquet.block.size", 256 * 1024) // many row groups
        .parquet(path)
      path
    }
    val shuffled = write("shuffled", keyed.orderBy(md5(col("l_partkey").cast("string"))))
    val oneKey = write("onekey", keyed.orderBy(col("l_partkey")))
    val zorder = write("zorder", keyed.orderBy(col("z")))

    val (pLo, pHi, sLo, sHi) = (10000L, 10640L, 500L, 532L)
    val predicates = Seq(
      "p-range only" -> (col("l_partkey").between(pLo, pHi)),
      "s-range only" -> (col("l_suppkey").between(sLo, sHi)),
      "2-D range" -> (col("l_partkey").between(pLo, pHi)
        && col("l_suppkey").between(sLo, sHi)))
    def scan(path: String, pred: org.apache.spark.sql.Column)
        : (Long, Long, Double) = {
      val df = spark.read.parquet(path).filter(pred)
        .agg(count(lit(1)), coalesce(sum(col("l_quantity")), lit(0.0)))
      bytes.set(0L)
      val r = df.head()
      Thread.sleep(300) // listener events are async; let the bus drain
      (bytes.get(), r.getLong(0), r.getDouble(1))
    }
    // warm the reader paths once so footers/JIT don't skew the compare
    scan(shuffled, predicates.head._2)
    predicates.foreach { case (qtag, pred) =>
      val rows = Seq("shuffled" -> shuffled, "one-key sort(p)" -> oneKey,
        "z-order" -> zorder).map { case (tag, p) =>
        val (b, n, s) = scan(p, pred)
        (tag, b, n, s)
      }
      require(rows.map(_._3).distinct.size == 1
        && rows.map(_._4).distinct.size == 1,
        s"layouts disagree on results: $rows")
      println(f"[$qtag] ${rows.head._3} rows")
      rows.foreach { case (tag, b, _, _) =>
        println(f"  $tag%-16s bytesRead=${b / 1024.0}%9.1f KiB")
      }
    }
    spark.stop()
  }
}
