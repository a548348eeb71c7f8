package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd tokenize-and-hash: the per-token portable word hash
  * ([[graft.ops.TextOps.wordHash]] — polyHash of the first 8 chars,
  * space-padded) of every whitespace token of the lowercased text, as
  * ONE pass over the string. Equivalent to
  * `transform(tokenize_ws(text), w -> word_hash(w))` (spec-asserted),
  * but the tokens are never materialized: hash-consuming pipelines
  * (count-min sketch build, any frequency sketch over tokens) explode
  * primitive longs instead of string slices — less per-row work AND an
  * 8-byte fixed payload through the explode/shuffle instead of a
  * variable-length string.
  */
case class WordHashes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WordHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordHashes.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "word_hashes"
}

object WordHashes {

  /** One-pass lowercase + tokenize + hash (Java-static for codegen).
    * Char scan over the lowercased string, as [[SimHashFp.compute]] —
    * `UTF8String.toLowerCase` IS Spark's `lower()`; ASCII/BMP corpus
    * assumed for the hash (char = codepoint), as documented for
    * wordHash.
    */
  def compute(u: UTF8String): ArrayData = {
    val s = u.toLowerCase.toString
    val len = s.length
    var out = new Array[Long](8)
    var n = 0
    var i = 0
    while (i <= len) {
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) {
        var h = 0L
        var k = 0
        while (k < 8) {
          val c = if (start + k < i) s.charAt(start + k).toLong else 32L
          h = h * 31L + c
          k += 1
        }
        if (n == out.length) {
          val grown = new Array[Long](out.length * 2)
          System.arraycopy(out, 0, grown, 0, out.length)
          out = grown
        }
        out(n) = h
        n += 1
      }
      i += 1
    }
    val exact = new Array[Long](n)
    System.arraycopy(out, 0, exact, 0, n)
    UnsafeArrayData.fromPrimitiveArray(exact)
  }
}
