package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Codegen'd per-payload byte statistics for the multimodal decode
  * stub: one loop per binary value computing length, pseudo-dims and
  * the 16-bin nibble histogram entropy — bit-identical to
  * [[graft.ops.MultimodalOps.decodeStub]] (the mapPartitions form),
  * but evaluated inside whole-stage codegen: no Dataset encoder
  * round-trip (binary → case class → row) per element, which made
  * q_media_features the most expensive "column algebra" query
  * (VERDICT r2 #3). Same playbook as [[ShingleHashes]].
  *
  * Output struct: (n_bytes int, width int, height int,
  * mean_byte double, entropy_proxy double).
  */
case class ByteStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ByteStats.schema

  override def nullSafeEval(input: Any): Any =
    ByteStats.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ByteStats.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ByteStats {

  val schema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    StructField("entropy_proxy", DoubleType, nullable = false)))

  /** Single-pass byte statistics (Java-static for codegen). The mean
    * accumulates in ascending index order and the entropy in ascending
    * bin order — the same fold order as decodeStub's `.sum`s, so the
    * doubles are bit-identical.
    */
  def compute(bytes: Array[Byte]): InternalRow = {
    val n = bytes.length
    val hist = new Array[Int](16)
    var sum = 0.0
    var i = 0
    while (i < n) {
      val b = bytes(i) & 0xff
      sum += b.toDouble
      hist(b >> 4) += 1
      i += 1
    }
    val mean = if (n == 0) 0.0 else sum / n
    var entropy = 0.0
    var j = 0
    while (j < 16) {
      val c = hist(j)
      if (c > 0) {
        val p = c.toDouble / n
        entropy -= p * math.log(p)
      }
      j += 1
    }
    if (n == 0) entropy = 0.0
    val width = if (n == 0) 0 else 16 + (bytes(0) & 0x7f)
    val height = if (n == 0) 0 else 16 + (bytes(n - 1) & 0x7f)
    new GenericInternalRow(Array[Any](n, width, height, mean, entropy))
  }
}
