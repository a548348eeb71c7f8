package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Positional sibling of [[ShingleHashes]]: the rolling polynomial
  * hash of EVERY n-char window, in position order and WITHOUT
  * de-duplication — element i is the hash of the window starting at
  * character i (0-based; callers `posexplode` and add 1 to line up
  * with the oracle's 1-based `substr` positions).
  *
  * [[ShingleHashes]] answers "which shingles does this doc contain"
  * (set semantics for MinHash/Jaccard); this one answers "what is at
  * each position", which is what span-level operators need — the
  * duplicated-substring extractor must map matching windows back to
  * character offsets to merge them into maximal spans. Same exact
  * rolling-hash algebra ([[graft.ops.TextOps.polyHash]]), so the
  * oracle replays it with the same `substr`-based SQL as
  * [[graft.ops.DedupOps.shingleTableSql]] minus the DISTINCT;
  * property-tested: `array_distinct(shingle_pos_hashes(s, n)) ==
  * shingle_hashes(s, n)` (both keep first-occurrence order).
  */
case class ShinglePosHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShinglePosHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShinglePosHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShinglePosHashes {

  /** Rolling per-position shingle hashing (Java-static for codegen). */
  def compute(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val len = s.length
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](len - n + 1)
    var pow = 1L // 31^(n-1)
    var k = 1
    while (k < n) { pow *= 31L; k += 1 }
    var h = 0L
    var i = 0
    while (i < n) { h = h * 31L + s.charAt(i).toLong; i += 1 }
    out(0) = h
    var start = 1
    while (start <= len - n) {
      h = (h - s.charAt(start - 1).toLong * pow) * 31L + s.charAt(start + n - 1).toLong
      out(start) = h
      start += 1
    }
    new GenericArrayData(out)
  }
}
