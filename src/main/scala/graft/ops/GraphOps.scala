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

  /** Deterministic PageRank in integer micro-units (total mass
    * S = [[pageRankScale]](n) = max(10^6, 1000·n) — per-node
    * resolution ≥ 1000 micro at ANY graph size), damping 0.85, a
    * fixed iteration count — every operation is exact 64-bit integer
    * arithmetic (`DIV`, `*`, `SUM(long)`), so the result is
    * order-free and bit-identical to the unrolled-CTE SQL replay
    * regardless of partitioning:
    *
    *   r₀(v)    = S DIV n
    *   rₜ₊₁(v)  = ((S DIV n)·15 DIV 100)
    *            + (85·(Σ_{u→v} rₜ(u) DIV outdeg(u) + Dₜ DIV n)) DIV 100
    *
    * where Dₜ = Σ rₜ over dangling (no-out-edge) nodes. Integer
    * division sheds ≤1 micro per term — deterministic truncation, the
    * price of cross-engine bit-equality (same policy as the LM scores
    * and HLL sketch).
    *
    * Scale shape: ranks/contribs stay distributed (one shuffle per
    * round: edges ⋈ ranks → groupBy dst); the per-round driver
    * traffic is TWO scalars (dangling mass + nothing else) — Lloyd's
    * k-row pattern. `localCheckpoint` per round is the sanctioned
    * iterative-lineage exception (see [[minLabelComponents]]).
    *
    * @param nodes  one `id` column, every vertex (dangling included)
    * @param edges  directed `src`,`dst` (pass both directions for an
    *               undirected graph); parallel edges contribute twice
    */
  /** Total-mass micro-units for an `n`-node graph: at least 1000
    * micro per node, so integer ranks never collapse to all-zero on
    * large graphs (a fixed 10^6 total would underflow past 10^6
    * nodes, and its teleport term already at 150k).
    */
  def pageRankScale(n: Long): Long = math.max(1000000L, 1000L * n)

  def pageRank(nodes: DataFrame, edges: DataFrame, iterations: Int = 10): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val n = nodes.count()
    require(n > 0, "pageRank: empty node set")
    val scale = pageRankScale(n)
    val r0 = scale / n // ≥ 1000 micro by construction
    val teleport = r0 * 15L / 100L

    // outdeg is constant per node — carry it in the rank table so each
    // round needs ONE join (ranks ⋈ edges), and the dangling-mass
    // aggregate is a plain filter+sum on the materialized table.
    // Reuse.materializedHandle (not localCheckpoint): each round
    // releases the previous round's blocks once the next is built, so
    // storage holds ≤ 2 rank generations; the FINAL table stays cached
    // under the releaseAllCaches-between-jobs contract.
    var (ranks, release) = Reuse.materializedHandle(nodes
      .join(deg, Seq("id"), "left")
      .select(col("id"), coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        lit(r0).as("rank")))
    for (_ <- 0 until iterations) {
      // dangling mass folds into the update plan as a broadcast 1-row
      // aggregate (cross join) instead of a per-round driver collect:
      // one Spark job per iteration, not two — same exact integer
      // arithmetic the unrolled-CTE oracle replays (dm DIV n)
      val dangling = ranks.filter(col("outdeg") === 0L)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
      val contribs = ranks.filter(col("outdeg") > 0L)
        .join(e, col("id") === col("src"))
        .select(col("dst"), expr("rank DIV outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val (next, nextRelease) = Reuse.materializedHandle(ranks
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("outdeg"),
          (lit(teleport) +
            expr(s"(85 * (coalesce(s, 0L) + dm DIV ${n}L)) DIV 100").cast("long"))
            .as("rank")))
      release.close()
      ranks = next
      release = nextRelease
    }
    ranks.select(col("id"), col("rank"))
  }

  /** PERSONALIZED PageRank: [[pageRank]] with the teleport vector
    * concentrated on a seed set instead of uniform — the
    * proximity-to-trusted-anchors score (seed a few vetted documents,
    * rank the rest by how tightly the similarity graph ties them to
    * the seeds; random-walk-with-restart semantics). Same exact
    * integer micro-unit contract as [[pageRank]], with two deltas the
    * oracle replays term for term: r₀ and the 15% restart mass go
    * only to seeds (S DIV |seeds| each, 0 elsewhere), and dangling
    * mass restarts to the SEEDS (Dₜ DIV |seeds|), not to all nodes —
    * the standard RWR formulation, which keeps non-seed mass strictly
    * walk-derived. Plan shape per round is identical to [[pageRank]]:
    * one edges ⋈ ranks shuffle, a broadcast 1-row dangling aggregate,
    * and the constant is_seed flag rides the rank table like outdeg.
    *
    * @param nodes `id` + boolean `is_seed` (at least one seed)
    * @param edges directed `src`,`dst`; pass both directions for an
    *              undirected graph
    */
  def personalizedPageRank(
      nodes: DataFrame, edges: DataFrame, iterations: Int = 10): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    val deg = e.groupBy(col("src").as("id")).agg(count(lit(1)).as("outdeg"))
    val n = nodes.count()
    val nSeeds = nodes.filter(col("is_seed")).count()
    require(nSeeds > 0, "personalizedPageRank: empty seed set")
    val scale = pageRankScale(n)
    val seedR0 = scale / nSeeds
    val teleport = seedR0 * 15L / 100L

    var (ranks, release) = Reuse.materializedHandle(nodes
      .join(deg, Seq("id"), "left")
      .select(col("id"), col("is_seed"),
        coalesce(col("outdeg"), lit(0L)).as("outdeg"),
        when(col("is_seed"), seedR0).otherwise(0L).as("rank")))
    for (_ <- 0 until iterations) {
      val dangling = ranks.filter(col("outdeg") === 0L)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("dm"))
      val contribs = ranks.filter(col("outdeg") > 0L)
        .join(e, col("id") === col("src"))
        .select(col("dst"), expr("rank DIV outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      val (next, nextRelease) = Reuse.materializedHandle(ranks
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("id"), col("is_seed"), col("outdeg"),
          (when(col("is_seed"), teleport).otherwise(0L) +
            expr("(85 * (coalesce(s, 0L) + " +
              s"(CASE WHEN is_seed THEN dm DIV ${nSeeds}L ELSE 0L END))) DIV 100")
              .cast("long"))
            .as("rank")))
      release.close()
      ranks = next
      release = nextRelease
    }
    ranks.select(col("id"), col("rank"))
  }

  /** Exact per-node triangle counts on an undirected simple graph,
    * by degree-ordered edge orientation (the "node-iterator++" /
    * compact-forward scheme): orient every edge toward its higher
    * (degree, id) endpoint, generate each node's out-neighbor pairs
    * (wedges), and close each wedge against the oriented edge list.
    * Orientation makes every out-degree O(√m), so wedge volume is
    * O(m^1.5) worst case — the optimal bound for exact triangle
    * enumeration — instead of Σ deg² of the naive neighbor join,
    * which a few crawl-hub nodes would blow up at 100 TB. Every
    * stage is an equi-join on node keys (degree join, wedge
    * self-join on `src`, closing join on the (u,v) pair); each
    * triangle is found exactly once, at its lowest-ranked vertex.
    *
    * Cross-engine determinism is structural: counts are integers and
    * the triangle SET is orientation-invariant, so an oracle may
    * enumerate by id order (a<b<c over DISTINCT pairs) and still
    * count identically.
    *
    * Reference computes no graph metrics beyond grouping
    * (deduplication_consumer.py's pairwise union only); this extends
    * the near-dup similarity graph family (q_pagerank, q_dedup_groups)
    * with the standard density/cohesion measure over dup clusters.
    *
    * @param nodes one `id` column, every vertex (isolated included)
    * @param pairs undirected unique edges (`a`, `b`), a < b, no
    *              self-loops — the near-dup `pairs` shape
    * @return (`id`, `degree`, `n_triangles`) for every node
    */
  def triangleCounts(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    val p = pairs.select(col("a"), col("b"))
    val deg = p.select(col("a").as("id")).union(p.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    // rank = (degree, id): a total order, so orientation is acyclic
    // and ties between equal-degree endpoints break deterministically
    val ranked = p
      .join(deg.select(col("id").as("a"), col("deg").as("dega")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("degb")), "b")
    val aLower = struct(col("dega"), col("a")) < struct(col("degb"), col("b"))
    val oriented = Reuse.materialized(ranked.select(
      when(aLower, col("a")).otherwise(col("b")).as("src"),
      when(aLower, struct(col("degb").as("d"), col("b").as("i")))
        .otherwise(struct(col("dega").as("d"), col("a").as("i"))).as("dst")))
    // wedges at the lowest-ranked vertex w; the closing (u,v) edge,
    // if present, is oriented u→v because rank(u) < rank(v) by the
    // wedge ordering — one equi-join probe, no direction cases
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.src") === col("e2.src") && col("e1.dst") < col("e2.dst"))
      .select(col("e1.src").as("w"), col("e1.dst.i").as("u"), col("e2.dst.i").as("v"))
    val tris = wedges.join(
      oriented.select(col("src").as("u"), col("dst.i").as("v")), Seq("u", "v"))
    val perNode = tris
      .select(explode(array(col("w"), col("u"), col("v"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("tri"))
    nodes.join(deg, Seq("id"), "left").join(perNode, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("deg"), lit(0L)).as("degree"),
        coalesce(col("tri"), lit(0L)).as("n_triangles"))
  }

  /** Bounded k-core peeling: `rounds` synchronous rounds of "drop
    * every vertex whose degree among SURVIVORS is < k" — the
    * density-core extractor (spam-farm / template-cluster detector on
    * the near-dup graph). True k-core iterates to a data-dependent
    * fixpoint; the FIXED round count keeps the computation a pure
    * function of the graph (same reasoning as [[labelPropagation]]),
    * so an unrolled-CTE oracle replays it exactly — peel chains
    * longer than `rounds` are documented residue, not nondeterminism.
    * Per round: two semi-joins against the survivor set + one degree
    * aggregate — all key equi-joins; two-generation cache via
    * [[Reuse.materializedHandle]].
    *
    * @param pairs undirected unique edges (`a`, `b`)
    * @return (`id`, `in_core` ∈ {0,1}) for every node in `nodes`
    */
  def kCorePeel(nodes: DataFrame, pairs: DataFrame, k: Int, rounds: Int): DataFrame = {
    val edges = pairs.select(col("a").as("src"), col("b").as("dst"))
      .union(pairs.select(col("b").as("src"), col("a").as("dst")))
      .localCheckpoint()
    var (alive, release) = Reuse.materializedHandle(
      edges.select(col("src").as("id")).distinct())
    for (_ <- 0 until rounds) {
      val (next, nextRelease) = Reuse.materializedHandle(
        edges.join(alive.select(col("id").as("src")), "src")
          .join(alive.select(col("id").as("dst")), "dst")
          .groupBy(col("src")).agg(count(lit(1)).as("d"))
          .filter(col("d") >= k).select(col("src").as("id")))
      release.close()
      alive = next
      release = nextRelease
    }
    nodes.join(alive.withColumn("in_core", lit(1L)), Seq("id"), "left")
      .select(col("id"), coalesce(col("in_core"), lit(0L)).as("in_core"))
  }

  /** Deterministic synchronous label-propagation communities (LPA,
    * Raghavan et al. 2007): every node starts as its own label; each
    * round, every node adopts the most frequent label among its
    * neighbors, ties broken by the SMALLEST label, all nodes updating
    * simultaneously from the previous round's labels. Synchronous
    * updates + total tie order make the algorithm a pure function of
    * the graph — bit-identical on any engine, certified by an
    * unrolled-CTE oracle replaying the same `rounds` steps.
    *
    * Unlike min-label components (which merge everything reachable),
    * LPA splits a connected graph into DENSITY communities — on the
    * near-dup graph that separates distinct boilerplate families that
    * happen to share a borderline pair. Per round: one ranks⋈edges
    * equi-join + two hash aggregates (label histogram, then the
    * (count DESC, label ASC) argmin via `min_by` — map-side
    * combinable, no window/sort). Two-generation cache via
    * [[Reuse.materializedHandle]], same memory contract as
    * [[pageRank]]. Fixed round count, no convergence detection: LPA
    * on bipartite-ish structures can oscillate, so a fixed horizon is
    * both the standard practice and the determinism guarantee.
    *
    * @param nodes one `id` column, every vertex (isolated included)
    * @param edges symmetric (`src`,`dst`) — pass both directions
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var (labels, release) = Reuse.materializedHandle(
      nodes.select(col("id"), col("id").as("lbl")))
    for (_ <- 0 until rounds) {
      val best = labels.join(e, col("id") === col("src"))
        .groupBy(col("dst"), col("lbl")).agg(count(lit(1)).as("cnt"))
        .groupBy(col("dst"))
        .agg(min_by(col("lbl"),
          struct((-col("cnt")).as("nc"), col("lbl").as("l"))).as("newlbl"))
      val (next, nextRelease) = Reuse.materializedHandle(
        labels.join(best.withColumnRenamed("dst", "id"), Seq("id"), "left")
          .select(col("id"), coalesce(col("newlbl"), col("lbl")).as("lbl")))
      release.close()
      labels = next
      release = nextRelease
    }
    labels
  }

  /** Bounded-depth multi-source BFS: exact shortest hop count from the
    * nearest seed, for every node reached within `rounds` hops.
    * Level-synchronous frontier relaxation — each round is ONE
    * edge equi-join plus a min-merge aggregate, the standard
    * Pregel-without-Pregel shape: at 100 TB both sides shuffle on the
    * node key and the reached set only grows, so round cost is bounded
    * by |reached ⋈ edges|, never |V|². The merged table is
    * re-materialized per round with a two-generation release window
    * (same policy as [[pageRank]]); lineage stays intact for
    * executor-loss recompute.
    *
    * Monotone convergence makes the result independent of join order
    * or partitioning: hop(id) = min over all ≤rounds-length seed paths
    * — an unrolled-CTE oracle replays it exactly.
    *
    * @param seeds one `id` column (hop-0 sources)
    * @param edges directed (`src`, `dst`); pass both directions for an
    *              undirected graph
    */
  def bfsHops(seeds: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var (dist, release) = Reuse.materializedHandle(
      seeds.select(col("id"), lit(0L).as("hop")))
    for (_ <- 0 until rounds) {
      val next = dist.join(e, col("id") === col("src"))
        .select(col("dst").as("id"), (col("hop") + 1L).as("hop"))
      val (merged, nextRelease) = Reuse.materializedHandle(
        dist.select(col("id"), col("hop")).union(next)
          .groupBy(col("id")).agg(min(col("hop")).as("hop")))
      release.close()
      dist = merged
      release = nextRelease
    }
    dist
  }

  /** Bounded-round WEIGHTED shortest paths from a seed set —
    * [[bfsHops]] with integer edge weights (distributed Bellman-Ford:
    * each round relaxes every edge once, so after R rounds every path
    * of ≤ R edges is optimal; like the BFS, the round bound is the
    * scale contract — distances through longer paths stay upper
    * bounds, never wrong values, and dup-graph diameters are small).
    * All-integer arithmetic (min over sums of BIGINT weights), so the
    * unrolled-CTE oracle replays bit-exactly. One edges ⋈ dist shuffle
    * + one min-aggregate per round; no driver-side state.
    *
    * @param seeds  `id` rows, distance 0
    * @param edges  directed weighted `src`,`dst`,`w` (w ≥ 0 BIGINT;
    *               pass both directions for an undirected graph)
    */
  def weightedHops(seeds: DataFrame, edges: DataFrame, rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint()
    var (dist, release) = Reuse.materializedHandle(
      seeds.select(col("id"), lit(0L).as("dist")))
    for (_ <- 0 until rounds) {
      val next = dist.join(e, col("id") === col("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("dist"))
      val (merged, nextRelease) = Reuse.materializedHandle(
        dist.select(col("id"), col("dist")).union(next)
          .groupBy(col("id")).agg(min(col("dist")).as("dist")))
      release.close()
      dist = merged
      release = nextRelease
    }
    dist
  }
}
