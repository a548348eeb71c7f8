package graft.tools

import org.apache.spark.sql.SparkSession

/** Time the streaming drains at alternative state-partition counts
  * (ad-hoc; StreamQueries pins its own count via withShufflePartitions,
  * so this only measures the harness-level sensitivity).
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[stream] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$r")
    }
    for (i <- 1 to 2) {
      t(s"q_stream_join #$i")(graft.SparkEntry.queries("q_stream_join")(spark, sfDir).count())
      t(s"q_stream_sessions #$i")(graft.SparkEntry.queries("q_stream_sessions")(spark, sfDir).count())
    }
    spark.stop()
  }
}
