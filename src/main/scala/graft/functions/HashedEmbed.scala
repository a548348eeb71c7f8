package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass 384-d hashed n-gram embedding — the native
  * Catalyst form of [[graft.ops.EmbeddingOps.embed]] (SURVEY.md §4
  * optional item (b): the last sanctioned UDF on a hot certified
  * path). Same construction bit for bit: lowercase, whitespace
  * tokens, unigram + adjacent-bigram grams, signed buckets from the
  * portable first-8-chars polynomial hash, L2 normalization to
  * float32 components — so q_hashed_embedding's DuckDB oracle
  * ([[graft.ops.EmbeddingOps.gramAccSqlCtes]]) keeps matching
  * unchanged.
  *
  * vs the UDF: no ScalaUDF closure call, no CatalystTypeConverters on
  * either side (UTF8String in, primitive float UnsafeArrayData out —
  * the UDF boxes every component through Array[Float] ⇒ ArrayData),
  * and the projection stays inside whole-stage codegen (asserted in
  * PlanSpec). The bigram hash reads straight out of the token spans —
  * no per-gram string concatenation at all.
  */
case class HashedEmbed(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    HashedEmbed.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashedEmbed.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "hashed_embed"
}

object HashedEmbed {

  private val Dim = graft.ops.EmbeddingOps.Dim

  /** One-pass embed (Java-static for codegen). UTF8String.toLowerCase
    * IS Spark's lower() — identical to the algebraic/oracle rendering
    * for ANY input; ASCII/BMP corpus assumed for the hash, as
    * documented for wordHash.
    */
  def compute(u: UTF8String): ArrayData = {
    val s = u.toLowerCase.toString
    val len = s.length
    val acc = new Array[Double](Dim)
    var prevStart = -1
    var prevEnd = -1
    var i = 0
    while (i <= len) {
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) {
        vote(acc, wordHash(s, start, i))
        if (prevStart >= 0) vote(acc, bigramHash(s, prevStart, prevEnd, start, i))
        prevStart = start
        prevEnd = i
      }
      i += 1
    }
    var sq = 0.0
    var j = 0
    while (j < Dim) { sq += acc(j) * acc(j); j += 1 }
    val out = new Array[Float](Dim)
    if (sq > 0) {
      val nrm = math.sqrt(sq)
      j = 0
      while (j < Dim) { out(j) = (acc(j) / nrm).toFloat; j += 1 }
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  private def vote(acc: Array[Double], h: Long): Unit = {
    val idx = (h % Dim).toInt
    acc(idx) += (if (((h >> 17) & 1L) == 0L) 1.0 else -1.0)
  }

  // polyHash of the first 8 chars of the token span, space-padded
  private def wordHash(s: String, start: Int, end: Int): Long = {
    var h = 0L
    var k = 0
    while (k < 8) {
      val c = if (start + k < end) s.charAt(start + k).toLong else 32L
      h = h * 31L + c
      k += 1
    }
    h
  }

  // polyHash of the first 8 chars of "w1_w2", read directly from the
  // two token spans (no concatenation)
  private def bigramHash(s: String, s1: Int, e1: Int, s2: Int, e2: Int): Long = {
    val len1 = e1 - s1
    var h = 0L
    var k = 0
    while (k < 8) {
      val c: Long =
        if (k < len1) s.charAt(s1 + k).toLong
        else if (k == len1) '_'.toLong
        else {
          val off = s2 + (k - len1 - 1)
          if (off < e2) s.charAt(off).toLong else 32L
        }
      h = h * 31L + c
      k += 1
    }
    h
  }
}
