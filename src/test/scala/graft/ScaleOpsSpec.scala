package graft

import graft.queries.ScaleQueries
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic specs for the scale-mechanics family: the quantile
  * sketch's error bound against exact percentiles, and the Z-order
  * layout's measurable locality win (the property the operator exists
  * for — tighter per-partition bounding boxes → better min/max
  * pruning).
  */
class ScaleOpsSpec extends AnyFunSuite {
  import TestSpark._

  test("quantile sketch bin contains the exact order statistic (tight bound)") {
    val est = ScaleQueries.q_quantile_sketch.fn(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    // exact order statistic under the SAME rule (value at rank
    // ceil(q·n) of the integer-cents domain) — the sketch's guarantee
    // is that this value falls inside the reported bin [v_lo, v_hi)
    val byType = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(r => math.max(math.floor(r.getDouble(1) * 100 + 0.5).toLong, 1L)).sorted)
      .toMap
    assert(est.keySet === byType.keySet.flatMap(t => Seq((t, 50), (t, 95), (t, 99))))
    for ((t, vs) <- byType; pct <- Seq(50, 95, 99)) {
      val n = vs.length.toLong
      val exact = vs(((n * pct + 99) / 100 - 1).toInt)
      val vLo = est((t, pct))
      // upper bin edge: next lattice point (1/16 relative width)
      val e = 63 - java.lang.Long.numberOfLeadingZeros(vLo max 1)
      val vHi = if (e < 4) vLo + 1 else vLo + (1L << (e - 4))
      assert(vLo <= exact && exact < vHi,
        s"($t,$pct): order stat $exact outside bin [$vLo, $vHi)")
    }
  }

  test("z-sorted layout has far tighter partition bounding boxes than id-sorted") {
    val pts = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        element_at(col("embedding"), 1).cast("double").as("x"),
        element_at(col("embedding"), 2).cast("double").as("y"),
        ScaleQueries.quant16(1).as("xq"), ScaleQueries.quant16(2).as("yq"))
    val withZ = ScaleQueries.withMortonZ(pts)
    def avgBboxArea(keyed: org.apache.spark.sql.DataFrame): Double =
      keyed.repartitionByRange(16, col("k"))
        .withColumn("pid", spark_partition_id())
        .groupBy(col("pid"))
        .agg(((max(col("x")) - min(col("x"))) *
          (max(col("y")) - min(col("y")))).as("area"))
        .agg(avg(col("area"))).head().getDouble(0)
    val zArea = avgBboxArea(withZ.withColumn("k", col("z")))
    val idArea = avgBboxArea(withZ.withColumn("k", col("vec_id")))
    // id order is spatially random → each partition spans ~the whole
    // unit square; z order must cut the average bbox area hard
    assert(zArea < idArea * 0.5, s"z=$zArea vs id=$idArea")
  }

  test("greedy packing RANGE-partitions shards: even spread, shard-contiguous") {
    // the fold is sequential WITHIN a shard and parallel ACROSS
    // shards; hash 8-into-8 could co-locate shards and idle slots
    // (round-7 verdict), so the plan must range-partition on shard
    val q = graft.queries.CurationQueries.q_pack_greedy.fn(spark, sf)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning(shard"), plan.take(1000))
    // contract checks on the same layout step: each shard lands wholly
    // in ONE partition (fold correctness) and the shards spread over
    // most of the 8 slots (even utilization — the point of the change)
    val spread = Tables.documents(spark, sf)
      .select((col("doc_id") % 8).as("shard"))
      .repartitionByRange(8, col("shard"))
      .select(spark_partition_id().as("p"), col("shard"))
      .distinct().collect().map(r => (r.getInt(0), r.getLong(1)))
    val partsPerShard = spread.groupBy(_._2).values.map(_.size)
    assert(partsPerShard.forall(_ == 1), "a shard straddled partitions")
    assert(spread.map(_._1).distinct.length >= 6,
      s"shards collapsed onto few partitions: ${spread.mkString(",")}")
  }
}
