package graft.tools

import java.nio.file.{Files, Paths}

/** Write each named query's `.explain("formatted")` output to
  * `<out>/<query>_<suffix>.txt` — the optimization-round evidence files
  * (plans/rNN/<query>_{before,after}.txt). Not part of the driver
  * contract.
  *
  * Note: queries that drain streams or run driver-side iteration inside
  * their builder execute that work during construction; the dumped plan
  * is the plan of the RETURNED DataFrame (the final read/serve stage).
  *
  * Usage: runMain graft.tools.DumpPlans <query...> [sf=DIR] [out=DIR]
  *        [suffix=before|after]
  */
object DumpPlans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.collectFirst { case s if s.startsWith("sf=") => s.drop(3) }
      .getOrElse("/root/testdata/sf0.1")
    val outDir = args.collectFirst { case s if s.startsWith("out=") => s.drop(4) }
      .getOrElse("plans/r13")
    val suffix = args.collectFirst { case s if s.startsWith("suffix=") => s.drop(7) }
      .getOrElse("before")
    val names = args.filterNot(_.contains("=")).toSeq
    require(names.nonEmpty,
      "usage: DumpPlans <query...> [sf=DIR] [out=DIR] [suffix=...]")
    val spark = graft.GraftSession.local("32", "ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"$outDir/${q}_$suffix.txt"), txt)
      graft.ops.Memos.clearAll()
      graft.ops.Reuse.releaseAllCaches(spark)
      println(s"wrote $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
