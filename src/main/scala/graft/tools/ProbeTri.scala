package graft.tools
object ProbeTri {
  def main(args: Array[String]): Unit = {
    print(graft.ops.DedupOps.minhashOracleSql(args.headOption.map(_.toDouble).getOrElse(0.5)))
  }
}
