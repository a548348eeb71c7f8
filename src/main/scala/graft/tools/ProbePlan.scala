package graft.tools

import org.apache.spark.sql.SparkSession

/** Print the formatted physical plan of named queries (ad-hoc). */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.01"
    val spark = graft.GraftSession.local("4", "ERROR")
    args.foreach { q =>
      println(s"===== $q =====")
      println(graft.SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan
        .toString.linesIterator.map(_.take(150)).take(45).mkString("\n"))
    }
    spark.stop()
  }
}
