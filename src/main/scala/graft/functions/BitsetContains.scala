package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Codegen'd membership probe against an immutable word-packed bit
  * set: `((words[p >>> 6] >>> (p & 63)) & 1) == 1` for a probe
  * position `p` already reduced to `[0, 64·words.length)` by the
  * caller (see [[graft.ops.BloomOps]]). The bit set rides into tasks
  * as a plan reference object (`ctx.addReferenceObj`) — exactly how
  * Spark's own runtime `bloom_filter` subquery ships its state — so
  * the probe stays inside whole-stage codegen: no UDF, no boxing, one
  * array load + shift per row.
  *
  * Same playbook as [[ByteStats]]/[[ShingleHashes]]: the hashing
  * itself is left to Spark's codegen'd `xxhash64`; this expression
  * only tests the precomputed position.
  */
case class BitsetContains(child: Expression, words: Array[Long])
    extends UnaryExpression {
  require(words.nonEmpty, "BitsetContains: words must be non-empty")

  // Analysis-time contract (instead of a runtime asInstanceOf surprise):
  // the probe must already be a LongType position in [0, 64·words.length),
  // which pmod(xxhash64(...), mBits) guarantees for the BloomOps callers.
  // (ExpectsInputTypes is out of reach — AbstractDataType is private[sql].)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"BitsetContains requires a BIGINT probe position, got ${child.dataType.sql}")

  override def dataType: DataType = BooleanType

  override def nullSafeEval(input: Any): Any = {
    val p = input.asInstanceOf[Long]
    ((words((p >>> 6).toInt) >>> (p & 63L).toInt) & 1L) == 1L
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bitsetWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (($ref[(int)($c >>> 6)] >>> (int)($c & 63L)) & 1L) == 1L;")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
