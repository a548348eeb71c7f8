package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd distinct character-shingle hashes of a string column:
  * equivalent to `array_distinct(transform(sequence .. substr ..,
  * polyHash))` but evaluated as ONE rolling-hash loop per row.
  *
  * The builtin formulation pays for itself three times over on the
  * dedup hot path: `TransformValues`/`ArrayTransform` are
  * CodegenFallback (interpreted lambda + boxing per element),
  * `substring` materializes an UTF8String per position, and
  * `array_distinct` re-walks the array. Shingling feeds every MinHash /
  * Jaccard / fingerprint query over (docs × positions) rows, which made
  * the interpreted lambdas the measured bottleneck (SURVEY §7.3's
  * custom-Expression escape hatch; same playbook as [[DotProduct]]).
  *
  * Hash identity: h(i) = Σ codepoint(char_{i+k}) · 31^(n-1-k) — exactly
  * [[graft.ops.TextOps.polyHash]], so every existing DuckDB oracle
  * keeps matching bit-for-bit. Computed with a rolling update
  * (h·31 − c_out·31ⁿ + c_in) in exact long arithmetic. Distinctness
  * keeps first-occurrence order like `array_distinct`. ASCII/BMP
  * corpus assumed (UTF-16 unit = codepoint), as documented for
  * `wordHash`.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle length must be >= 1, got $n")


  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row; the loop itself is compiled Scala —
    // stays inside whole-stage codegen with no per-element
    // interpretation (the static forwarder makes it Janino-callable)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {

  /** Rolling distinct shingle hashing (Java-static for codegen). */
  def compute(u: UTF8String, n: Int): ArrayData = {
    val s = u.toString
    val len = s.length
    if (len < n) return new GenericArrayData(Array.empty[Long])
    val out = new Array[Long](len - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](math.max(16, (len - n + 1) * 2))
    var pow = 1L // 31^(n-1)
    var k = 1
    while (k < n) { pow *= 31L; k += 1 }
    var h = 0L
    var i = 0
    while (i < n) { h = h * 31L + s.charAt(i).toLong; i += 1 }
    var m = 0
    if (seen.add(h)) { out(m) = h; m += 1 }
    var start = 1
    while (start <= len - n) {
      h = (h - s.charAt(start - 1).toLong * pow) * 31L + s.charAt(start + n - 1).toLong
      if (seen.add(h)) { out(m) = h; m += 1 }
      start += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}
