package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Deterministic hashed n-gram text embedding (SURVEY.md §2.10 U5):
  * the engine's stand-in for the reference's MiniLM sentence encoder
  * (`embedding_consumer.py:94-153`, 384-dim at `:54`). Preserves the
  * operator semantics the pipeline needs — fixed-dim float vector,
  * L2-normalized, identical text ⇒ identical vector, cosine-comparable
  * — without model/network dependencies; an ONNX encoder is a drop-in
  * replacement for [[embed]].
  *
  * Feature hashing: word unigrams + bigrams → signed buckets
  * (hash-sign trick), then L2 normalization. Seedless and portable:
  * only arithmetic on codepoints.
  */
object EmbeddingOps {

  val Dim = 384

  private def hash64(s: String): Long =
    s.foldLeft(1125899906842597L)((acc, c) => acc * 31 + c.toLong)

  /** Embed one text (pure function, exposed for tests). */
  def embed(text: String): Array[Float] = {
    val acc = new Array[Double](Dim)
    val words = text.toLowerCase.split(" ").filter(_.nonEmpty)
    def add(gram: String): Unit = {
      val h = hash64(gram)
      val idx = ((h % Dim) + Dim) % Dim
      val sign = if (((h >>> 17) & 1L) == 0L) 1.0 else -1.0
      acc(idx.toInt) += sign
    }
    words.foreach(add)
    words.sliding(2).filter(_.length == 2).foreach(p => add(p(0) + "_" + p(1)))
    val nrm = math.sqrt(acc.map(v => v * v).sum)
    if (nrm == 0) new Array[Float](Dim)
    else acc.map(v => (v / nrm).toFloat)
  }

  /** Column form (plain Scala UDF — the SURVEY §7.3 sanctioned place
    * for one: the per-row closure is the operator, not glue).
    */
  val embedUdf = udf((text: String) => embed(if (text == null) "" else text))

  def embedCol(text: Column): Column = embedUdf(text)
}
