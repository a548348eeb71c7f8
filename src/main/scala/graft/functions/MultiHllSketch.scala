package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass MULTI-COLUMN HLL profiler state: one aggregate that
  * carries, for every child column at once, the exact row count, the
  * exact null count, and the 256-register HLL table of the non-null
  * values — the whole per-column profile in one fixed-size buffer.
  *
  * This is the shape the 100 TB table profiler wants
  * ([[graft.queries.ScaleQueries.q_table_profile_sketch]]): the
  * previous certified plan stacked the table 11× with `stack(...)`
  * (an Expand node — 11 physical rows per input row) so that a
  * row-oriented groupBy("column") could build each column's sketch.
  * At sf0.1 that is 6.6M expanded rows through the hash aggregate for
  * a ≤ 11·257-row result; at 100 TB it is an 11× blow-up of the scan.
  * Here each input row is visited ONCE and updates all columns'
  * registers in place: no Expand, no per-row group probing, and the
  * shuffled partial state is `n_cols × (16B + m)` bytes REGARDLESS of
  * input size — the profiler's whole map side degenerates to one
  * `ObjectHashAggregate` over a buffer smaller than a parquet footer.
  *
  * Register semantics are BIT-IDENTICAL to the row-oriented path
  * ([[graft.ops.SketchOps.hllRegisters]] — property- and
  * oracle-tested): `h0 = Md5Poly8(value)`, one Mersenne-mix, low
  * [[graft.ops.SketchOps.P]] bits pick the register, the remaining
  * 23-bit slice's leading-zero rank is max-merged. The DuckDB oracle
  * that replays md5+Horner in SQL keeps matching with NO oracle
  * change, which is the point: this commit swaps only the execution
  * shape, never the certified numbers.
  *
  * Evaluates to `array<struct<n_rows, n_nulls, regs: array<int>>>` in
  * child order; `regs` is the DENSE m-entry table (0 = register never
  * hit). The caller explodes the (tiny) array and feeds the rows with
  * `reg >= 1` to the shared estimate read-off
  * ([[graft.ops.SketchOps.hllEstimateOnly]]), so the bias-corrected /
  * linear-counting arithmetic is literally the same code path the
  * certified sketches already run.
  */
case class MultiHllSketch(
    children: Seq[Expression],
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[MultiHllSketch.Buf] {

  require(children.nonEmpty, "MultiHllSketch: at least one column required")

  import MultiHllSketch._
  private def nCols: Int = children.length

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == StringType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "MultiHllSketch requires STRING children (cast/canonicalize upstream so " +
        "the oracle replays the same rendering); got " +
        children.map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("regs", ArrayType(IntegerType, containsNull = false),
        nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): Buf =
    new Buf(new Array[Long](nCols), new Array[Long](nCols),
      new Array[Byte](nCols * M))

  override def update(buf: Buf, input: InternalRow): Buf = {
    var i = 0
    while (i < nCols) {
      buf.rows(i) += 1L
      val v = children(i).eval(input)
      if (v == null) buf.nulls(i) += 1L
      else {
        val h0 = Md5Poly8.compute(v.asInstanceOf[UTF8String])
        // same mix → idx/rank algebra as SketchOps.hllHashed (h0 >= 0:
        // an 8-hex-digit Horner fold never exceeds 31^7·'f' << 2^63)
        val h = (MixA * (h0 % Mersenne) + MixB) % Mersenne
        val idx = (h % M).toInt
        val rest = h / M
        val rank = // = W+1 - length(bin(rest)), the codegen'd column form
          if (rest == 0L) (W + 1)
          else W + 1 - (64 - java.lang.Long.numberOfLeadingZeros(rest))
        val at = i * M + idx
        if (rank > buf.regs(at)) buf.regs(at) = rank.toByte
      }
      i += 1
    }
    buf
  }

  override def merge(buf: Buf, other: Buf): Buf = {
    var i = 0
    while (i < nCols) {
      buf.rows(i) += other.rows(i)
      buf.nulls(i) += other.nulls(i)
      i += 1
    }
    var j = 0
    val n = nCols * M
    while (j < n) {
      if (other.regs(j) > buf.regs(j)) buf.regs(j) = other.regs(j)
      j += 1
    }
    buf
  }

  override def eval(buf: Buf): Any = {
    val out = new Array[Any](nCols)
    var i = 0
    while (i < nCols) {
      val regs = new Array[Int](M)
      var r = 0
      while (r < M) { regs(r) = buf.regs(i * M + r).toInt; r += 1 }
      out(i) = new GenericInternalRow(Array[Any](
        buf.rows(i), buf.nulls(i), new GenericArrayData(regs)))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bytes = new Array[Byte](nCols * 16 + nCols * M)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var i = 0
    while (i < nCols) { bb.putLong(buf.rows(i)); bb.putLong(buf.nulls(i)); i += 1 }
    bb.put(buf.regs)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val rows = new Array[Long](nCols)
    val nulls = new Array[Long](nCols)
    var i = 0
    while (i < nCols) { rows(i) = bb.getLong(); nulls(i) = bb.getLong(); i += 1 }
    val regs = new Array[Byte](nCols * M)
    bb.get(regs)
    new Buf(rows, nulls, regs)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MultiHllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MultiHllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MultiHllSketch =
    copy(children = newChildren)
  override def prettyName: String = "multi_hll_sketch"
}

object MultiHllSketch {
  // mirrors graft.ops.SketchOps — duplicated as plain constants so the
  // functions package keeps no dependency on the ops layer; the
  // equality is asserted in SketchSpec
  val Mersenne: Long = 2147483647L
  val MixA: Long = 1540483477L
  val MixB: Long = 12345L
  val P: Int = 8
  val M: Int = 1 << P
  val W: Int = 23

  /** Mutable aggregation state: per column, exact row/null counts and
    * the dense byte register table (ranks ≤ W+1 = 24 fit a byte).
    */
  final class Buf(
      val rows: Array[Long], val nulls: Array[Long], val regs: Array[Byte])

  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** `multi_hll_sketch(col1, ..., colN)` as a Column aggregate. */
  def multiHll(cols: Seq[Column]): Column =
    GraftColumnBridge.column(
      MultiHllSketch(cols.map(GraftColumnBridge.expression))
        .toAggregateExpression())
}
