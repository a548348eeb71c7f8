package graft.tools

/** Split a query's wall time into (a) DataFrame construction (driver
  * code in the query builder, incl. any memo fills / driver loops),
  * (b) analysis+optimization+physical planning (executedPlan), and
  * (c) execution (count on the planned frame) — to size the
  * driver-side planning share of the bench suite (ad-hoc, not part of
  * the driver contract).
  *
  * Usage: runMain graft.tools.ProbePlanTime <query...> [reps=N] [sf=DIR]
  */
object ProbePlanTime {
  def main(args: Array[String]): Unit = {
    val reps = args.collectFirst { case s if s.startsWith("reps=") => s.drop(5).toInt }.getOrElse(2)
    val sfDir = args.collectFirst { case s if s.startsWith("sf=") => s.drop(3) }
      .getOrElse("/root/testdata/sf0.1")
    val names = args.filterNot(s => s.startsWith("reps=") || s.startsWith("sf=")).toSeq
    val spark = graft.GraftSession.local("32", "ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect()
    try graft.SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    for (rep <- 1 to reps; name <- names) {
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.executedPlan // force analysis+optimization+planning
      val t2 = System.nanoTime()
      df.count()
      val t3 = System.nanoTime()
      graft.ops.Reuse.releaseAllCaches(spark)
      println(f"[rep $rep] $name%-28s build ${(t1 - t0) / 1e9}%6.3f  " +
        f"plan ${(t2 - t1) / 1e9}%6.3f  exec ${(t3 - t2) / 1e9}%6.3f")
    }
    spark.stop()
  }
}
