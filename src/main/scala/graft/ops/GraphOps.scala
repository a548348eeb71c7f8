package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation — the
  * shared resolution kernel behind DBSCAN cluster ids (M1) and
  * near-duplicate group formation. Input: a symmetric edge list
  * (`src`, `dst`). Output: (`id`, `label`) for every node appearing in
  * an edge, `label` = the component's minimum node id (deterministic).
  *
  * Two paths, same semantics:
  *  - small graphs (≤ `localMaxEdges`): edges fit comfortably on the
  *    driver → one local union-find beats ~log n shuffle rounds;
  *  - at scale: iterative neighbor-min propagation PLUS pointer
  *    jumping (label ← label(label)), which contracts convergence from
  *    O(diameter) to O(log n) rounds; `localCheckpoint` per round
  *    truncates lineage (iterative plans grow until OOM otherwise),
  *    and convergence is detected by the label-sum fixpoint (labels
  *    only decrease) — one aggregate per round, no join.
  * GraphX `connectedComponents` is the drop-in unbounded-scale
  * replacement; the edge list is already in its shape.
  */
object GraphOps {

  /** Rounds the last distributed propagation took to converge
    * (diagnostic; 0 after a union-find fast path). Pointer jumping
    * bounds this by ~log₂(largest component) + 2: each round at least
    * halves the label-chain length. Asserted ≤ log₂(n)+2 in
    * GraphOpsSpec on real edge sets. DIAGNOSTIC ONLY: a process-wide
    * cell — concurrent minLabelComponents calls clobber each other's
    * value, so read it only in single-threaded harness/spec code,
    * never for control flow.
    */
  val lastRounds = new java.util.concurrent.atomic.AtomicInteger(0)

  /** @param localMaxEdges gate for the driver union-find fast path:
    *   2 M edges × 16 B (two boxed longs in the parent map) ≈ 32 MB of
    *   driver heap plus the collected array — comfortably inside any
    *   driver's memory; beyond it the distributed propagation runs.
    *   Set 0 to force the distributed path (scale testing).
    */
  def minLabelComponents(
      edges: DataFrame, localMaxEdges: Long = 2000000L): DataFrame = {
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val nodes = e.select(col("src").as("id")).distinct()

    val edgeCount = e.count()
    lastRounds.set(0)
    if (edgeCount <= localMaxEdges) {
      import spark.implicits._
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val nx = parent(c); parent(c) = r; c = nx }
        r
      }
      e.collect().foreach { row =>
        val (a, b) = (find(row.getLong(0)), find(row.getLong(1)))
        if (a != b) parent(math.max(a, b)) = math.min(a, b)
      }
      val ids = nodes.collect().map(_.getLong(0))
      ids.map(id => (id, find(id))).toSeq.toDF("id", "label")
        .repartition(col("id")).localCheckpoint()
    } else {
      var labels = nodes.withColumn("label", col("id")).localCheckpoint()
      var labelSum = Long.MinValue
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 50) {
        val prop = e
          .join(labels.select(col("id").as("dst"), col("label").as("dlabel")), "dst")
          .groupBy(col("src").as("id")).agg(min(col("dlabel")).as("nbrMin"))
        val viaNbr = labels.join(prop, Seq("id"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("nbrMin"), col("label"))).as("label"))
        val next = viaNbr.as("l1")
          .join(viaNbr.select(col("id").as("jid"), col("label").as("jlabel")).as("l2"),
            col("l1.label") === col("jid"), "left")
          .select(col("l1.id").as("id"),
            least(col("l1.label"), coalesce(col("jlabel"), col("l1.label"))).as("label"))
          .localCheckpoint()
        val newSum = next.agg(coalesce(sum(col("label")), lit(0L))).head().getLong(0)
        changed = if (newSum == labelSum) 0L else 1L
        labelSum = newSum
        labels = next
        iter += 1
      }
      lastRounds.set(iter)
      labels
    }
  }
}
