package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Expression, InterpretedOrdering, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StructType}

/** Single-pass exact top-k aggregate (SURVEY.md §4 optional item (a)):
  * keeps the k SMALLEST struct rows by the struct's ascending
  * lexicographic order in a bounded k-element heap, per aggregation
  * group, and evaluates to the sorted `array<struct>`.
  *
  * Mixed sort directions are expressed by negating numeric fields
  * (e.g. `struct(-n, word)` ascending ≡ `(n DESC, word ASC)`), the
  * same contract as any composite sort key.
  *
  * Why an aggregate and not `ORDER BY … LIMIT k` / a rank window:
  *  - global top-k: equivalent to `TakeOrderedAndProject`, but
  *    COMPOSABLE — it can sit NEXT TO other aggregates in one
  *    `agg(...)` pass instead of forcing a separate sort stage;
  *  - grouped top-k ("top N per group"): replaces the
  *    window-rank-filter shape (`row_number over (partition by g
  *    order by s) <= k`), which shuffles and SORTS every row of every
  *    group — this aggregate shuffles k-row partial buffers per
  *    (partition, group) and never sorts beyond the heap, the shape
  *    that survives a 100 TB group with a billion rows.
  *
  * Partial aggregation works through the standard
  * `TypedImperativeAggregate` serialize/merge contract (each partial
  * buffer is ≤ k UnsafeRow images), planned via ObjectHashAggregate —
  * one aggregate, no window exchange (asserted in PlanSpec).
  */
case class TopKRows(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.PriorityQueue[InternalRow]]
    with UnaryLike[Expression] {

  require(k >= 1, s"TopKRows: k must be >= 1 (got $k)")

  private lazy val structType = child.dataType.asInstanceOf[StructType]

  // ascending lexicographic interpreted ordering over the struct
  // fields; the heap is a MAX-heap under it, so dequeuing evicts the
  // largest and the k smallest survive
  private lazy val ordering: Ordering[InternalRow] = new InterpretedOrdering(
    structType.fields.zipWithIndex.map { case (f, i) =>
      SortOrder(BoundReference(i, f.dataType, f.nullable), Ascending)
    }.toIndexedSeq)

  private lazy val proj = UnsafeProjection.create(structType)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case s: StructType if s.fields.nonEmpty &&
        s.fields.forall(f => RowOrdering.isOrderable(f.dataType)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"TopKRows requires a non-empty struct of orderable fields, got ${other.sql}")
  }

  override def dataType: DataType = ArrayType(structType, containsNull = false)
  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.PriorityQueue[InternalRow] =
    mutable.PriorityQueue.empty[InternalRow](ordering)

  override def update(
      buf: mutable.PriorityQueue[InternalRow],
      input: InternalRow): mutable.PriorityQueue[InternalRow] = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.asInstanceOf[InternalRow])
    buf
  }

  override def merge(
      buf: mutable.PriorityQueue[InternalRow],
      other: mutable.PriorityQueue[InternalRow]): mutable.PriorityQueue[InternalRow] = {
    other.foreach(offer(buf, _))
    buf
  }

  private def offer(
      buf: mutable.PriorityQueue[InternalRow], row: InternalRow): Unit = {
    if (buf.size < k) {
      buf.enqueue(row.copy()) // eval reuses its row image — must copy
    } else if (ordering.lt(row, buf.head)) {
      buf.dequeue()
      buf.enqueue(row.copy())
    }
  }

  override def eval(buf: mutable.PriorityQueue[InternalRow]): Any =
    new GenericArrayData(buf.toArray.sorted(ordering).map(_.asInstanceOf[Any]))

  override def serialize(buf: mutable.PriorityQueue[InternalRow]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val dos = new DataOutputStream(out)
    dos.writeInt(buf.size)
    buf.foreach { r =>
      val bytes = proj(r).getBytes
      dos.writeInt(bytes.length)
      dos.write(bytes)
    }
    dos.flush()
    out.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[InternalRow] = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = createAggregationBuffer()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val rowBytes = new Array[Byte](len)
      in.readFully(rowBytes)
      val row = new UnsafeRow(structType.length)
      row.pointTo(rowBytes, len)
      buf.enqueue(row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): TopKRows =
    copy(child = newChild)
  override def prettyName: String = "top_k_rows"
}

object TopKRows {
  import org.apache.spark.sql.{Column, GraftColumnBridge}

  /** `top_k_rows(sortStruct, k)` as a Column aggregate: the k smallest
    * struct rows in ascending order. Flip numeric fields' sign for
    * descending components.
    */
  def topK(sortStruct: Column, k: Int): Column =
    GraftColumnBridge.column(
      TopKRows(GraftColumnBridge.expression(sortStruct), k)
        .toAggregateExpression())
}
