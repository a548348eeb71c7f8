package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level vector math over `ArrayType(FloatType)` embedding
  * columns, built from Spark's higher-order functions (`zip_with` /
  * `aggregate` / `transform`) so everything stays inside whole-stage
  * codegen — no UDF serialization on the hot path (reference vector ops:
  * `chromadb_client.py:194-219`, cosine at `deduplication_consumer.py:
  * 198-222`).
  *
  * All arithmetic is double-precision left-to-right folds, which is
  * also what DuckDB's `list_dot_product` computes — the oracle compare
  * is bit-exact.
  */
object VectorOps {

  /** Cast a float vector to double for stable arithmetic. */
  def asDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /** Left-fold dot product of two double vectors. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity of two float vectors (cast to double first).
    * Builtin-only fallback; hot paths use the codegen'd
    * [[graft.functions.DotProduct]] expression instead.
    */
  def cosine(a: Column, b: Column): Column = {
    val ad = asDouble(a)
    val bd = asDouble(b)
    dot(ad, bd) / (sqrt(dot(ad, ad)) * sqrt(dot(bd, bd)))
  }
}
