package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The single-pass moments buffer must equal the explode + pair-join
  * formulation it replaces (the d²-row-amplification path), and its
  * merge must be partitioning-invariant — the two properties that make
  * it the deploy-scale accumulator behind streaming PCA.
  */
class VectorMomentsSpec extends AnyFunSuite {
  import TestSpark._

  private val dim = 6

  private lazy val vecs = {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    ((0 until 300).map(i => (i.toLong, Array.fill(dim)(rnd.nextGaussian().toFloat))) ++
      Seq((900L, null.asInstanceOf[Array[Float]]), // skipped: null
        (901L, Array(1.0f, 2.0f)))) // skipped: wrong dim
      .toDF("vec_id", "embedding")
  }

  private def buffer(df: org.apache.spark.sql.DataFrame): Array[Double] =
    df.agg(graft.functions.VectorMoments(col("embedding"), dim).as("m"))
      .head().getSeq[Double](0).toArray

  test("buffer equals the explode + pair-join moments") {
    val m = buffer(vecs)
    val x = vecs
      .filter(col("embedding").isNotNull && size(col("embedding")) === dim)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("x"))
    val e = x.select(col("vec_id"), posexplode(col("x")).as(Seq("j", "vj")))
    assert(m(0) === x.count().toDouble)
    val first = e.groupBy(col("j")).agg(sum(col("vj")).as("s"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    (0 until dim).foreach { j =>
      assert(math.abs(m(1 + j) - first(j)) < 1e-9, s"first moment $j")
    }
    val second = e.join(
        e.select(col("vec_id"), col("j").as("k"), col("vj").as("vk")), "vec_id")
      .groupBy(col("j"), col("k")).agg(sum(col("vj") * col("vk")).as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    for (j <- 0 until dim; k <- 0 until dim)
      assert(math.abs(m(1 + dim + j * dim + k) - second((j, k))) < 1e-9,
        s"second moment ($j,$k)")
  }

  test("merge is partitioning-invariant") {
    val whole = buffer(vecs.coalesce(1))
    val split = buffer(vecs.repartition(7))
    whole.zip(split).zipWithIndex.foreach { case ((a, b), i) =>
      assert(math.abs(a - b) < 1e-9, s"buffer slot $i: $a vs $b")
    }
  }

  test("plans as one ObjectHashAggregate — no explode, no join") {
    val p = vecs.agg(graft.functions.VectorMoments(col("embedding"), dim))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"), s"expected object hash agg:\n$p")
    assert(!p.contains("Generate") && !p.contains("Join"),
      s"moments must not amplify rows:\n$p")
  }
}
