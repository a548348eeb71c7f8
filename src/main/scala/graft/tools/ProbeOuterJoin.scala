package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc: per-batch progress of the left-outer interval join drain
  * (watermark trajectory, state rows removed, rows emitted per batch)
  * to pin down Spark's outer-row eviction boundary empirically.
  */
object ProbeOuterJoin {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.GraftSession.local("8", "ERROR")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val op = p.stateOperators.headOption
        println(s"[batch ${p.batchId}] rows=${p.numInputRows} " +
          s"wm=${p.eventTime.get("watermark")} " +
          s"stateRows=${op.map(_.numRowsTotal)} removed=${op.map(_.numRowsRemoved)} " +
          s"outputRows=${p.sink.numOutputRows}")
      }
    }
    spark.streams.addListener(listener)
    val df = graft.SparkEntry.queries("q_stream_join_outer")(spark, sfDir)
    println(s"TOTAL=${df.count()}")
    Thread.sleep(1000)
    spark.stop()
  }
}
