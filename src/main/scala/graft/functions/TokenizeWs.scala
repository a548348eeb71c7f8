package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd whitespace tokenizer: `filter(split(lower(text), " "),
  * w -> length(w) > 0)` as ONE loop per row. The builtin formulation's
  * `filter` is a CodegenFallback higher-order function (interpreted
  * lambda + boxing per token), and [[graft.ops.TextOps.words]] feeds
  * 18 call sites across the text/curation/retrieval families — the
  * single most-used primitive in the engine.
  *
  * Identity: lowercasing uses `UTF8String.toLowerCase` — the SAME
  * routine Spark's `lower()` runs — and splitting keeps non-empty
  * runs between single-space delimiters in order, exactly the
  * filter-split composition (and the oracles' `list_filter(
  * string_split(lower(..)))` rendering). Token values are slices of
  * the lowercased UTF8 buffer; no String round-trip.
  */
case class TokenizeWs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TokenizeWs.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.TokenizeWs.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenizeWs {

  /** One-pass lowercase + split + drop-empties (Java-static for
    * codegen). Byte-level scan: ' ' (0x20) never appears inside a
    * UTF-8 multi-byte sequence, so splitting on the raw bytes of the
    * lowercased string is exact for any input.
    */
  def compute(u: UTF8String): ArrayData = {
    val s = u.toLowerCase
    val bytes = s.getBytes // one materialization; tokens slice into it
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](8)
    var i = 0
    while (i <= n) {
      val start = i
      while (i < n && bytes(i) != 0x20) i += 1
      if (i > start) out.add(UTF8String.fromBytes(bytes, start, i - start))
      i += 1
    }
    val arr = new Array[AnyRef](out.size)
    var k = 0
    while (k < arr.length) { arr(k) = out.get(k); k += 1 }
    new GenericArrayData(arr)
  }
}
