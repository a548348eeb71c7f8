package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.DotProduct

/** Session-extension entry point: registers the engine's native
  * Catalyst expressions at session build time, so a cluster deploy can
  * enable them with `--conf spark.sql.extensions=graft.GraftExtensions`
  * (the in-process path `GraftFunctions.register(spark)` does the same
  * for an already-built session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      exprs => DotProduct(exprs.head, exprs(1))))
}
