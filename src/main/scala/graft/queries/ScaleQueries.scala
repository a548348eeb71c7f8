package graft.queries

import graft.{QueryDef, Tables}
import graft.ops.BloomOps
import org.apache.spark.sql.functions._

/** Scale-mechanics operators: techniques whose POINT is the 100 TB
  * execution shape (runtime-filter pruning, mergeable sketches, data
  * layout), each certified against an oracle that states the
  * equivalent semantics without the mechanism — proving the mechanism
  * changes the plan, not the answer.
  */
object ScaleQueries {

  /** Runtime Bloom-filter join pruning ([[BloomOps.bloomPrunedJoin]]):
    * lineitem pruned through a 2^16-bit / 3-hash Bloom filter of the
    * urgent-1997 order keys before the join. The oracle is the PLAIN
    * join — certifying that the pruned plan is result-identical (no
    * false negatives; false positives removed by the exact join).
    * Reference analog: every dashboard join against a filtered
    * dimension (`app_upgraded.py` date-window fetches); at 100 TB the
    * pruned probe rows never reach the shuffle.
    */
  val q_bloom_join = QueryDef(
    "q_bloom_join",
    """SELECT MONTH(o.o_orderdate) AS mon,
      |  COUNT(*) AS n_items,
      |  ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
      |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |WHERE o.o_orderpriority = '1-URGENT'
      |  AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin) { (spark, dir) =>
    val small = Tables.orders(spark, dir)
      .filter(col("o_orderpriority") === "1-URGENT" &&
        col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    BloomOps.bloomPrunedJoin(
        Tables.lineitem(spark, dir), small, "l_orderkey", "o_orderkey")
      .groupBy(month(col("o_orderdate")).as("mon"))
      .agg(
        count(lit(1)).as("n_items"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
          .as("revenue"))
      .orderBy(col("mon"))
  }

  val all: Seq[QueryDef] = Seq(q_bloom_join)
}
