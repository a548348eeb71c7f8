package graft.tools

import org.apache.spark.sql.SparkSession

/** Generic repeat-bench of named queries under Bench-identical
  * conditions — the per-query counterpart of [[ProbeStream]] for
  * targeted iteration (not part of the driver contract).
  *
  * Usage: runMain graft.tools.ProbeQuery <query...> [reps=N] [sf=DIR]
  */
object ProbeQuery {
  def main(args: Array[String]): Unit = {
    val reps = args.collectFirst { case s if s.startsWith("reps=") => s.drop(5).toInt }.getOrElse(3)
    val sfDir = args.collectFirst { case s if s.startsWith("sf=") => s.drop(3) }
      .getOrElse("/root/testdata/sf0.1")
    // memoclear: replicate Bench's per-pass accounting (memos cleared at
    // every rep boundary, so each rep re-pays each memo's fill cost once)
    val memoClear = args.contains("memoclear")
    val names = args.filterNot(s =>
      s.startsWith("reps=") || s.startsWith("sf=") || s == "memoclear").toSeq
    require(names.nonEmpty, "usage: ProbeQuery <query...> [reps=N] [sf=DIR] [memoclear]")
    val spark = graft.GraftSession.local("32", "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/region.parquet").count()
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (rep <- 1 to reps; name <- names) {
      if (memoClear && name == names.head) graft.ops.Memos.clearAll()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      graft.ops.Reuse.releaseAllCaches(spark)
      times(name) = times(name) :+ dt
      println(f"[rep $rep] $name%-28s $dt%6.2f s")
    }
    names.foreach { name =>
      val v = times(name).sorted
      println(f"$name%-28s median ${v(v.length / 2)}%6.2f  min ${v.head}%6.2f  max ${v.last}%6.2f")
    }
    spark.stop()
  }
}
