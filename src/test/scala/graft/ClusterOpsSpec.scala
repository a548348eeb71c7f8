package graft

import graft.ops.ClusterOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Grid-DBSCAN verified against an independent brute-force in-memory
  * DBSCAN on the same points (same eps/minPts/min-id-label semantics).
  */
class ClusterOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val eps = 0.02
  private val minPts = 4

  private lazy val pts = Tables.embeddings(spark, sf).select(
    col("vec_id"),
    element_at(col("embedding"), 1).cast("double").as("x"),
    element_at(col("embedding"), 2).cast("double").as("y"))

  /** Reference implementation: O(n²), driver-side. */
  private def bruteDbscan(
      points: Array[(Long, Double, Double)]): Map[Long, Long] = {
    val n = points.length
    def close(i: Int, j: Int): Boolean = {
      val dx = points(i)._2 - points(j)._2
      val dy = points(i)._3 - points(j)._3
      dx * dx + dy * dy <= eps * eps
    }
    val neighbors = Array.tabulate(n)(i =>
      (0 until n).filter(j => j != i && close(i, j)).toArray)
    val isCore = neighbors.map(_.length >= minPts - 1)
    // union-find over core-core edges
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (i <- 0 until n if isCore(i); j <- neighbors(i) if isCore(j)) {
      val (a, b) = (find(i), find(j)); if (a != b) parent(math.max(a, b)) = math.min(a, b)
    }
    val compLabel = scala.collection.mutable.Map[Int, Long]()
    for (i <- 0 until n if isCore(i)) {
      val root = find(i)
      val id = points(i)._1
      compLabel(root) = math.min(compLabel.getOrElse(root, Long.MaxValue), id)
    }
    points.indices.map { i =>
      val label: Long =
        if (isCore(i)) compLabel(find(i))
        else {
          val coreNbrs = neighbors(i).filter(isCore)
          if (coreNbrs.nonEmpty) coreNbrs.map(j => compLabel(find(j))).min
          else -1L
        }
      points(i)._1 -> label
    }.toMap
  }

  test("grid DBSCAN matches brute-force DBSCAN (both component paths)") {
    val local = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = bruteDbscan(local)
    for (gate <- Seq(Long.MaxValue /* local union-find */, 0L /* distributed */)) {
      val got = ClusterOps.dbscan(pts, "vec_id", "x", "y", eps, minPts, gate)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got.size === want.size)
      val diff = got.collect { case (k, v) if want(k) != v => (k, v, want(k)) }
      assert(diff.isEmpty, s"gate=$gate label mismatches: ${diff.take(5)}")
    }
  }

  /** Driver-side reference Lloyd's: same standardization, seeds,
    * quantization, tie-break and empty-cluster rules as
    * [[ClusterOps.kmeansLloyd]], written independently over collected
    * points.
    */
  private def bruteLloyd(
      points: Array[(Long, Double, Double)], k: Int, iters: Int)
      : Array[(Long, Long, Double, Double)] = {
    def quant(v: Double): Double = math.floor(v * 1000000 + 0.5) / 1000000.0
    val n = points.length
    def meanStd(vs: Array[Double]): (Double, Double) = {
      val m = vs.sum / n
      (quant(m), quant(math.sqrt(vs.map(v => (v - m) * (v - m)).sum / (n - 1))))
    }
    val (mx, sx) = meanStd(points.map(_._2))
    val (my, sy) = meanStd(points.map(_._3))
    val z = points.sortBy(_._1).map { case (id, x, y) =>
      (id, (x - mx) / sx, (y - my) / sy)
    }
    var cents = z.take(k).map(p => (p._2, p._3))
    def assign(): Array[Int] = z.map { case (_, zx, zy) =>
      cents.zipWithIndex.minBy { case ((cx, cy), j) =>
        ((zx - cx) * (zx - cx) + (zy - cy) * (zy - cy), j)
      }._2
    }
    for (_ <- 1 to iters) {
      val a = assign()
      cents = cents.zipWithIndex.map { case (old, j) =>
        val mine = z.indices.filter(a(_) == j)
        if (mine.isEmpty) old
        else (quant(mine.map(i => z(i)._2).sum / mine.size),
          quant(mine.map(i => z(i)._3).sum / mine.size))
      }
    }
    val a = assign()
    cents.zipWithIndex.map { case ((cx, cy), j) =>
      (j.toLong, a.count(_ == j).toLong, cx, cy)
    }
  }

  test("deterministic Lloyd's matches an independent driver-side Lloyd's") {
    val local = pts.collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val want = bruteLloyd(local, k = 5, iters = 6).toSeq
    val got = ClusterOps.kmeansLloyd(pts, "vec_id", "x", "y", k = 5, iters = 6)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
      .toSeq
    assert(got === want)
    assert(got.map(_._2).sum === local.length.toLong)
  }

  test("two successive kmeansLloyd calls leave no pinned blocks") {
    graft.ops.Reuse.releaseAllCaches(spark)
    ClusterOps.kmeansLloyd(pts, "vec_id", "x", "y", k = 3, iters = 2).collect()
    ClusterOps.kmeansLloyd(pts, "vec_id", "x", "y", k = 3, iters = 2).collect()
    // unpersist is async — poll until the registry drains
    val deadline = System.currentTimeMillis() + 10000
    while (spark.sparkContext.getPersistentRDDs.nonEmpty &&
      System.currentTimeMillis() < deadline) Thread.sleep(50)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      s"leaked: ${spark.sparkContext.getPersistentRDDs.keys}")
  }

  test("constant coordinate column: stddev guard keeps output finite") {
    import spark.implicits._
    val const = Seq((1L, 5.0, 1.0), (2L, 5.0, 2.0), (3L, 5.0, 3.0))
      .toDF("vec_id", "x", "y")
    val out = ClusterOps.kmeansLloyd(const, "vec_id", "x", "y", k = 2, iters = 2)
      .collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(!r.getDouble(2).isNaN && !r.getDouble(2).isInfinite)
      assert(!r.getDouble(3).isNaN && !r.getDouble(3).isInfinite)
    }
    assert(out.map(_.getLong(1)).sum === 3L)
  }

  test("kmeans is deterministic for a fixed seed and covers all points") {
    val a = ClusterOps.kmeans2d(pts, "x", "y", 5, 42L)
      .groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val b = ClusterOps.kmeans2d(pts, "x", "y", 5, 42L)
      .groupBy("cluster_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(a === b)
    assert(a.values.sum === pts.count())
  }
}
