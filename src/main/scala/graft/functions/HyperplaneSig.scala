package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Codegen'd random-hyperplane LSH signature of an `array<double>`
  * vector: bit i = sign(v · h_i) where hyperplane h_i's components are
  * ±1 from a deterministic integer mix of (i, d) — no RNG state, no
  * materialized hyperplane table.
  *
  * The column-algebra formulation builds `bits × dim` `element_at`
  * terms in one projection (2300+ expression nodes at 36 bits × 64
  * dims) — enormous generated code that falls off the codegen happy
  * path. Here the whole signature is one tight two-level loop
  * (mix cost is ~bits·dim integer ops per row, trivial next to the
  * loads). Same accumulation order as the `reduce(_ + _)` left fold,
  * so signatures are bit-identical to the algebraic version (pinned by
  * spec).
  */
case class HyperplaneSig(child: Expression, bits: Int, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], bits, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HyperplaneSig.compute($c, $bits, $dim);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneSig {

  /** h_i[d] in {-1, +1} from a murmur-style finalizer over the flat
    * hyperplane/component index — bit 16 of the mixed value (the raw
    * low bit of odd·x is just x&1: degenerate).
    */
  def coeff(i: Int, d: Int, dim: Int): Double = {
    var x = 2654435761L * (i * dim + d + 1)
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 29
    if (((x >>> 16) & 1L) == 0L) 1.0 else -1.0
  }

  /** Full signature in one pass (Java-static for codegen). */
  def compute(a: ArrayData, bits: Int, dim: Int): Long = {
    val n = math.min(dim, a.numElements())
    var sig = 0L
    var i = 0
    while (i < bits) {
      var s = 0.0
      var d = 0
      while (d < n) { s += a.getDouble(d) * coeff(i, d, dim); d += 1 }
      if (s > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }
}
