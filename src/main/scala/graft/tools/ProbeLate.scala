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

    // Round 2 of the probe: round 1 showed NO drops — Spark keeps two
    // watermarks (SPARK-42376): late-event filtering in batch N uses
    // the EVICTION watermark of batch N-1 (= max ts through batch
    // N-2, minus delay), so one-batch-late rows always survive. This
    // round plants a two-batch-late row whose window end equals that
    // filter watermark EXACTLY (boundary <=? <?) and a three-batch-late
    // row that must drop under any reading.
    val files = Seq(
      // max ts of file0 = Jan 2 00:00:00 exactly (a day-2 row)
      Seq(("f0_d1", day(1, 5)), ("f0_edge", day(2, 0))),
      Seq(("f1_d3", day(3, 7)), ("f1_late_d1", day(1, 8))),
      // two-batch late: filter wm in batch 2 = Jan 2 00:00 = window end
      Seq(("f2_d4", day(4, 3)), ("f2_late_d1", day(1, 9))),
      // three-batch late: filter wm in batch 3 = Jan 3 07:00 > window end
      Seq(("f3_d5", day(5, 2)), ("f3_late_d1", day(1, 10))))
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
