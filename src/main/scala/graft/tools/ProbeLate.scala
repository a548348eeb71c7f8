package graft.tools

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** Empirical nail-down of the watermark late-drop semantics a certified
  * late-data audit must replay exactly:
  *
  *  1. file order under maxFilesPerTrigger=1 for sequentially-written
  *     parquet files (mtime, then path?);
  *  2. when the watermark advances (end of batch N applies to N+1) and
  *     the boundary of the drop rule for a windowed aggregation in
  *     Append mode (window.end <= wm vs < wm, vs raw ts);
  *  3. whether AvailableNow's trailing no-data batch advances the
  *     watermark to the global max and flushes the tail windows.
  *
  * Usage: runMain graft.tools.ProbeLate
  */
object ProbeLate {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("8", "ERROR")
    import spark.implicits._
    val work = graft.streaming.StreamingOps.tempSinkDir("graft_probe_late_")
    val src = s"$work/src"

    def day(d: Int, h: Int): java.sql.Timestamp =
      java.sql.Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")

    // file0: on-time day1+day2; file1: day3 + late(day1, day2);
    // file2: day4 + late(day2, day3)
    val files = Seq(
      Seq(("f0_d1", day(1, 5)), ("f0_d2", day(2, 6))),
      Seq(("f1_d3", day(3, 7)), ("f1_late_d1", day(1, 8)), ("f1_late_d2", day(2, 9)),
        // boundary probe: ts exactly AT the watermark (= day2 06:00)
        ("f1_at_wm", day(2, 6))),
      Seq(("f2_d4", day(4, 3)), ("f2_late_d2", day(2, 10)), ("f2_late_d3", day(3, 1))))
    files.zipWithIndex.foreach { case (rows, i) =>
      rows.toDF("tag", "ts").coalesce(1).write.mode("append").parquet(src)
      Thread.sleep(1100) // distinct mtimes → deterministic file order
      println(s"wrote file $i: ${rows.map(_._1).mkString(",")}")
    }

    val schema = spark.read.parquet(src).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(src)
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n"), collect_list(col("tag")).as("tags"))

    val out = s"$work/out"
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dropped = p.stateOperators.headOption
          .map(_.numRowsDroppedByWatermark).getOrElse(-1L)
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} dropped=$dropped")
      }
    })
    val q = stream.select(col("w.start").as("wstart"), col("n"), col("tags"))
      .writeStream.outputMode(OutputMode.Append)
      .option("checkpointLocation", s"$work/ckpt")
      .trigger(Trigger.AvailableNow())
      .format("parquet").option("path", out).start()
    q.awaitTermination()
    Thread.sleep(500)

    println("=== emitted windows ===")
    spark.read.parquet(out).orderBy("wstart")
      .collect().foreach(r => println(s"${r.get(0)}  n=${r.get(1)}  tags=${r.getSeq[String](2).sorted.mkString(",")}"))
    spark.stop()
  }
}
