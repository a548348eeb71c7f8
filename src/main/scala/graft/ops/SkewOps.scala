package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities. AQE's skew-join handling covers
  * sort-merge joins automatically; explicit salting remains the tool
  * when a hot key would overwhelm a single reducer in aggregations or
  * non-SMJ joins at 100 TB.
  */
object SkewOps {

  /** Salted equi-join: the fact side gets a per-row salt, the (small)
    * dimension side is replicated across all salt values, and the join
    * key becomes (key, salt) — a hot key's rows spread over
    * `saltFactor` reducers. Result is row-identical to the unsalted
    * join.
    */
  def saltedJoin(
      facts: DataFrame, dim: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    // pmod(_, 0) is null and explode(array()) is empty — a non-positive
    // factor would silently return ZERO rows instead of the documented
    // row-identical join
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = facts.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val dimExpanded = dim.withColumn("_salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(dimExpanded, keys :+ "_salt").drop("_salt")
  }

  /** Two-phase (salted partial, then final) aggregation for hot-key
    * counts: groupBy (key, salt) first, then re-aggregate by key.
    * Spark's partial aggregation already does this map-side; the
    * explicit form exists for aggregations where partial aggregation
    * cannot apply (e.g. exact distinct collections).
    */
  def twoPhaseCount(
      df: DataFrame, keys: Seq[String], saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = df.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    salted
      .groupBy((keys :+ "_salt").map(col): _*)
      .agg(count(lit(1)).as("_partial"))
      .groupBy(keys.map(col): _*)
      .agg(sum(col("_partial")).as("n"))
  }
}
