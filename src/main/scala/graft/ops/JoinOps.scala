package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators Spark lacks natively, composed from built-ins with
  * the scale-correct shuffle shape (SURVEY.md §7.3 ladder step (a)).
  */
object JoinOps {

  /** As-of join: each left row picks the LATEST right row with
    * `right.ts <= left.ts` within the same key (inclusive), or nulls
    * when none precedes. Implemented as the union + last(ignoreNulls)
    * running window — ONE shuffle on (key), no range self-join, no
    * per-key collect: the classic distributed as-of plan. At equal
    * timestamps the right row wins (inclusive bound) via the tag sort.
    *
    * Inputs must carry unique column names apart from `keyCol`;
    * right rows must be unique per (key, ts) — pre-aggregate ties
    * upstream (`max_by`) or the match is nondeterministic in ANY
    * engine.
    */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      keyCol: String, leftTsCol: String, rightTsCol: String,
      rightValCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == keyCol || c == leftTsCol)
    // internal working columns must not collide with user columns: pick
    // the first suffix level that makes every generated name fresh
    // (deterministic — no UUIDs in the plan, which would defeat plan
    // caching and make EXPLAIN diffs noisy)
    val taken = (left.columns ++ right.columns).toSet
    val sfx = Iterator.from(0).map(i => if (i == 0) "" else "_" + i)
      .find(s => Seq("_ts", "_isRight", "_rvals", "_rv").forall(b => !taken(b + s)))
      .get
    val (cTs, cIsRight, cRvals, cRv) =
      ("_ts" + sfx, "_isRight" + sfx, "_rvals" + sfx, "_rv" + sfx)
    // the right row's value columns travel as ONE struct, so the
    // running `last` picks a whole row atomically — per-column lasts
    // with ignoreNulls would stitch fields from DIFFERENT right rows
    // whenever a right value column contains nulls (DuckDB's native
    // ASOF JOIN, the oracle, is row-atomic)
    val rvType = org.apache.spark.sql.types.StructType(
      rightValCols.map(c => right.schema(c).copy(name = c)))
    val l = left.select(
      Seq(col(keyCol), col(leftTsCol).as(cTs), lit(0).as(cIsRight)) ++
        leftCols.map(col) :+
        lit(null).cast(rvType).as(cRvals): _*)
    val r = right.select(
      Seq(col(keyCol), col(rightTsCol).as(cTs), lit(1).as(cIsRight)) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightValCols.map(col): _*).as(cRvals): _*)
    // right rows sort BEFORE left rows at the same ts -> inclusive bound
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(cTs), col(cIsRight).desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    l.unionByName(r)
      .withColumn(cRv, last(col(cRvals), ignoreNulls = true).over(w))
      .filter(col(cIsRight) === 0)
      .select(
        Seq(col(keyCol), col(cTs).as(leftTsCol)) ++
          leftCols.map(col) ++
          rightValCols.map(c => col(s"$cRv.$c").as(c)): _*)
  }
}
