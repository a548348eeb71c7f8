package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relevance analysis — the engine's version of the reference's
  * struct-returning relevance UDF (`relevance_consumer.py:108-290`:
  * keyword tables in closure `:124-151`, severity rules `:243-249`,
  * capped confidence `:251-266`). Instead of an opaque UDF the whole
  * bundle is pure column algebra over `typedLit` keyword arrays —
  * Catalyst sees every predicate (codegen, pushdown, pruning), which is
  * the SURVEY.md §2.10 U1 design decision.
  *
  * Topic vocabulary is domain-neutral (matches the synthetic corpus);
  * swapping the keyword map re-targets the operator without touching
  * the plan shape.
  */
object RelevanceOps {

  /** topic -> keywords (analogue of the disease/symptom keyword tables). */
  val Topics: Seq[(String, Seq[String])] = Seq(
    "joins" -> Seq("join", "merge", "hash"),
    "streaming" -> Seq("stream", "batch", "window"),
    "performance" -> Seq("fast", "slow", "big", "small"),
    "storage" -> Seq("table", "scan", "row", "key"))

  val SevereHits = 8
  val ModerateHits = 4
  val ConfBase = 0.25
  val ConfPerHit = 0.05
  val ConfCap = 0.9

  /** Per-topic hit count columns (token multiplicity, like the
    * reference's per-keyword counting).
    */
  def topicHits(ws: Column): Seq[(String, Column)] =
    Topics.map { case (t, kws) => t -> TextOps.tokenHits(ws, kws) }

  /** The full analysis bundle as named columns over a words column. */
  def analysisColumns(ws: Column): Seq[Column] = {
    val hits = topicHits(ws)
    val total = hits.map(_._2).reduce(_ + _)
    val matched = array_sort(filter(
      array(hits.map { case (t, h) => when(h > 0, lit(t)) }: _*),
      c => c.isNotNull))
    val severity = when(total >= SevereHits, "high")
      .when(total >= ModerateHits, "medium").otherwise("low")
    val confidence = round(
      least(lit(ConfCap), lit(ConfBase) + lit(ConfPerHit) * total), 4)
    Seq(
      array_join(matched, ",").as("matched_topics"),
      (total > 0).as("is_relevant"),
      total.cast("long").as("total_hits"),
      severity.as("severity"),
      confidence.as("confidence"))
  }

  /** DuckDB rendering of the same bundle, from the same constants. */
  def analysisSql(wsExpr: String): Seq[(String, String)] = {
    val hitExprs = Topics.map { case (t, kws) =>
      t -> TextOps.tokenHitsSql(wsExpr, kws)
    }
    val total = hitExprs.map(_._2).mkString("(", " + ", ")")
    val matchedList = Topics.map { case (t, kws) =>
      s"CASE WHEN ${TextOps.tokenHitsSql(wsExpr, kws)} > 0 THEN '$t' END"
    }.mkString("[", ", ", "]")
    Seq(
      // COALESCE: DuckDB's array_to_string yields NULL (not '') on []
      "matched_topics" ->
        s"COALESCE(array_to_string(list_sort(list_filter($matchedList, x -> x IS NOT NULL)), ','), '')",
      "is_relevant" -> s"($total > 0)",
      "total_hits" -> s"CAST($total AS BIGINT)",
      "severity" -> (s"CASE WHEN $total >= $SevereHits THEN 'high' " +
        s"WHEN $total >= $ModerateHits THEN 'medium' ELSE 'low' END"),
      "confidence" ->
        s"ROUND(LEAST($ConfCap, $ConfBase + $ConfPerHit * $total), 4)")
  }
}
