package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd one-pass form of the engine's portable uniform hash
  * `polyHash(substring(md5(s), 1, 8), 8)` — the HLL register hash
  * ([[graft.ops.SketchOps]]). The algebraic chain materializes the
  * 32-char hex string, then runs 8 substring+ascii calls per row —
  * measured at ~10 s of the sketch profiler's 11.8 s over 6.6M rows.
  * This expression digests the UTF-8 bytes directly (thread-local
  * MessageDigest) and Horner-folds the first 8 hex DIGIT CODEPOINTS
  * from the first 4 digest bytes — bit-identical to the algebraic
  * form (property-tested against an independent hex-string reference),
  * so every DuckDB oracle that replays `md5(...)` keeps matching.
  */
case class Md5Poly8(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    Md5Poly8.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Md5Poly8.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "md5_poly8"
}

object Md5Poly8 {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** polyHash (Horner, base 31) of the first 8 lowercase-hex chars of
    * md5(bytes) — Spark's `md5(string)` digests the UTF-8 bytes and
    * renders lowercase hex, so char k of its output is nibble k of the
    * digest. Java-static for codegen.
    */
  def compute(u: UTF8String): Long = {
    val md = md5.get()
    md.reset()
    val digest = md.digest(u.getBytes)
    var h = 0L
    var i = 0
    while (i < 4) {
      val b = digest(i) & 0xff
      h = h * 31L + hexCode(b >>> 4)
      h = h * 31L + hexCode(b & 0xf)
      i += 1
    }
    h
  }

  private def hexCode(nib: Int): Long =
    if (nib < 10) ('0' + nib).toLong else ('a' + nib - 10).toLong
}
