package graft.tools
object DumpOracle {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    print(graft.SparkEntry.oracleSql(name))
  }
}
