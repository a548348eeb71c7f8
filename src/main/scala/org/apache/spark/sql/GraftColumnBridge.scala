package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types.StructType

/** Bridge to the `private[sql]` Column↔Expression converters — the
  * one sanctioned way for a library shipping custom Catalyst
  * expressions (that carry non-SQL-encodable state, e.g. a centroid
  * table) to lift them into the public Column API on Spark 4.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Re-wrap an InternalRow RDD (e.g. a persisted `toRdd`) as a
    * DataFrame — `SparkSession.internalCreateDataFrame` is
    * private[sql]; this forwarder lets graft.ops.Reuse cache shared
    * subplans at the UnsafeRow layer (no columnar re-encode) while
    * keeping lineage, which Dataset-level persist/localCheckpoint
    * can't offer together.
    */
  def internalCreateDataFrame(
      spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)

  /** The physical InternalRow RDD of a DataFrame. */
  def toRdd(df: DataFrame): RDD[InternalRow] =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.toRdd
}
