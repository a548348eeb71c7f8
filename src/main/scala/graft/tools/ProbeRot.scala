package graft.tools

import graft.Tables
import org.apache.spark.sql.functions._

/** Diagnose the OPQ rotation's geometry (round-13): the ProbeAnn
  * SANITY row (exact brute force on rotated vectors vs raw-space
  * truth) read 0.064 instead of the 1.0 a genuine orthonormal map
  * guarantees, which means every rotated-PQ recall ever measured was
  * measuring the basis, not the codebooks. This probe decomposes the
  * failure: the Gram matrix of the fitted deflated-PCA basis
  * (max |<vi,vj> - δij| over all pairs), the spread of row norms, and
  * the rank story — printed for PERF.md.
  */
object ProbeRot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val iters = args.drop(1).headOption.map(_.toInt).getOrElse(2)
    val m = args.drop(2).headOption.map(_.toInt).getOrElse(64)
    val spark = graft.GraftSession.local("32", "ERROR")
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val (mu, comps) = graft.ops.PcaOps.topComponents(
      emb, "vec_id", "embedding", 64, iters, m)
    println(s"probe-rot: n=$n dim=64 iters=$iters m=$m")
    // Gram deviation
    var maxOff = 0.0; var minDiag = Double.MaxValue; var maxDiag = 0.0
    var worstPair = (0, 0)
    for (i <- comps.indices; j <- i until comps.length) {
      val d = (0 until 64).map(t => comps(i)(t) * comps(j)(t)).sum
      if (i == j) { minDiag = math.min(minDiag, d); maxDiag = math.max(maxDiag, d) }
      else if (math.abs(d) > maxOff) { maxOff = math.abs(d); worstPair = (i, j) }
    }
    println(f"  diag(norms^2): min $minDiag%.6f max $maxDiag%.6f")
    println(f"  max |off-diag <vi,vj>|: $maxOff%.6f at pair $worstPair")
    // distribution of off-diagonal magnitudes
    val offs = for (i <- comps.indices; j <- (i + 1) until comps.length)
      yield math.abs((0 until 64).map(t => comps(i)(t) * comps(j)(t)).sum)
    val sorted = offs.sorted
    def pct(p: Double) = sorted((p * (sorted.size - 1)).toInt)
    println(f"  off-diag |dot| p50 ${pct(0.5)}%.6f p90 ${pct(0.9)}%.6f p99 ${pct(0.99)}%.6f max ${sorted.last}%.6f")
    // how much of a random vector's norm survives the projection —
    // for an orthonormal full-rank basis this is exactly 1
    val probeVec = Array.tabulate(64)(j => math.sin(j + 1.0))
    val pn2 = probeVec.map(x => x * x).sum
    val proj = comps.map(v => (0 until 64).map(t => v(t) * probeVec(t)).sum)
    println(f"  norm preservation on a fixed probe vector: ${proj.map(x => x * x).sum / pn2}%.6f (1.0 = isometry)")
    spark.stop()
  }
}
