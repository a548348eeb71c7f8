package graft

import graft.ops.EmbeddingOps
import org.scalatest.funsuite.AnyFunSuite

class EmbeddingOpsSpec extends AnyFunSuite {

  private def cos(a: Array[Float], b: Array[Float]): Double = {
    val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
    dot // inputs are unit-normalized
  }

  test("embedding is deterministic, fixed-dim, unit-norm") {
    val e1 = EmbeddingOps.embed("fast join query on big table")
    val e2 = EmbeddingOps.embed("fast join query on big table")
    assert(e1.toSeq === e2.toSeq)
    assert(e1.length === EmbeddingOps.Dim)
    val nrm = math.sqrt(e1.map(v => v.toDouble * v).sum)
    assert(math.abs(nrm - 1.0) < 1e-5)
  }

  test("identical text -> cosine 1, unrelated -> lower") {
    val a = EmbeddingOps.embed("stream batch window aggregation")
    val b = EmbeddingOps.embed("stream batch window aggregation")
    val c = EmbeddingOps.embed("customer order line part supplier")
    assert(math.abs(cos(a, b) - 1.0) < 1e-5)
    assert(cos(a, c) < 0.9)
  }

  test("empty/null-ish text embeds to the zero vector") {
    val z = EmbeddingOps.embed("")
    assert(z.forall(_ == 0.0f))
  }

  test("shared vocabulary raises cosine monotonically") {
    val base = EmbeddingOps.embed("join merge hash table scan")
    val near = EmbeddingOps.embed("join merge hash table row")
    val far = EmbeddingOps.embed("alpha beta gamma delta epsilon")
    assert(cos(base, near) > cos(base, far))
  }
}
