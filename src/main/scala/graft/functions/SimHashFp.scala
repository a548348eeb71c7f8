package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass SimHash fingerprint of a text column: tokenize
  * (split on ' ', drop empties, lowercase — [[graft.ops.TextOps.words]]
  * semantics), per-occurrence signed bit votes from the word hash
  * ([[graft.ops.TextOps.wordHash]]: polyHash of the first 8 chars
  * space-padded), fingerprint bit j set iff votes_j > 0.
  *
  * Replaces the explode → (id, word) count → 40 conditional sums →
  * fingerprint pipeline: that shape shuffles the exploded word table
  * TWICE (count groupBy + fingerprint groupBy); this is a pure
  * PROJECTION — at 100 TB the whole signature stage becomes map-side.
  * Vote identity: Σ_distinct-words cnt·(±1) == Σ_occurrences (±1) in
  * exact integer arithmetic, so fingerprints are bit-identical to the
  * algebraic form and the DuckDB oracle keeps matching.
  */
case class SimHashFp(child: Expression, bits: Int) extends UnaryExpression {
  // a single long fingerprint: shifts past 63 wrap mod 64 on the JVM
  // and would fold garbage bits instead of erroring
  require(bits >= 1 && bits <= 64, s"simhash bits must be in [1, 64], got $bits")


  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHashFp.compute(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.SimHashFp.compute($c, $bits);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashFp {

  /** One-pass fingerprint (Java-static for codegen). ASCII/BMP corpus
    * assumed (UTF-16 unit = codepoint), as documented for wordHash.
    */
  def compute(u: UTF8String, bits: Int): Long = {
    // UTF8String.toLowerCase IS the routine Spark's lower() (and
    // TokenizeWs) runs — sharing it keeps fingerprints identical to
    // the algebraic lower()-based formulation for ANY input, where
    // String.toLowerCase(ROOT) could diverge on non-ASCII text
    val s = u.toLowerCase.toString
    val len = s.length
    val votes = new Array[Int](bits)
    var i = 0
    while (i <= len) {
      // token spans [start, i) at each delimiter/end
      var start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) {
        // wordHash: polyHash of the first 8 chars, space-padded
        var h = 0L
        var k = 0
        while (k < 8) {
          val c = if (start + k < i) s.charAt(start + k).toLong else 32L
          h = h * 31L + c
          k += 1
        }
        var j = 0
        while (j < bits) {
          votes(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) fp |= (1L << j)
      j += 1
    }
    fp
  }
}
