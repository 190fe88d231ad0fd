package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives for dedup clustering. A near-dup pair
  * list is a graph; the dedup groups a pipeline must act on are its
  * CONNECTED COMPONENTS (the pairwise greedy policy of dd6 is not
  * transitive: a~b, b~c does not mark {a,b,c} as one group).
  */
object Graph {

  /** Connected components by min-label propagation: every node starts
    * labeled with itself; each round takes the min of its own and its
    * neighbors' labels; fixpoint = components keyed by their minimum
    * node id. Returns (id, component).
    *
    * Each round is one equi-join + partial-aggregated min — fully
    * distributed, no driver data movement except a one-row convergence
    * aggregate. Per-round frames are `localCheckpoint`ed, not just
    * persisted: an iterative join otherwise grows the LOGICAL PLAN one
    * join deeper per round, and Catalyst re-analyzes the whole
    * accumulated tree each iteration — checkpointing truncates lineage
    * so round N's plan is one join, not N. (localCheckpoint trades
    * executor-loss fault tolerance for speed; on a cluster that must
    * survive preemption, swap in `checkpoint` with a checkpoint dir —
    * same algorithm.)
    *
    * Convergence is detected without an extra join: labels only ever
    * decrease, so sum(component) is strictly decreasing until fixpoint;
    * equal consecutive sums == no label changed. Summed as decimal(38,0)
    * so arbitrary long ids cannot overflow.
    *
    * Rounds needed = component diameter; near-dup clusters are shallow
    * (a handful of hops), so plain propagation is the right tool — for
    * web-scale graphs with long chains, swap in the large-star/small-star
    * variant (same API, fewer rounds). If maxIters is hit before
    * fixpoint, unconverged labels are still a valid REFINEMENT of the
    * true components (labels propagate only along real edges, so two
    * different components can never share a label — an overlong chain
    * may split, never wrongly merge).
    *
    * The returned frame is checkpointed and materialized; callers
    * holding the session long-term should `.unpersist()` it once
    * consumed.
    */
  def connectedComponents(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 20): DataFrame = {
    val sym = edges.select(col(aCol).as("a"), col(bCol).as("b"))
      .union(edges.select(col(bCol).as("a"), col(aCol).as("b")))
      .distinct()
      .localCheckpoint()
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("component").cast("decimal(38,0)")).as("s"))
        .head.getDecimal(0)
    var labels = sym.select(col("a").as("id")).distinct()
      .withColumn("component", col("id"))
      .localCheckpoint()
    var prevSum = labelSum(labels)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val nbrMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(col("a")).agg(min(col("component")).as("__nbr"))
      val next = labels.join(nbrMin, labels("id") === nbrMin("a"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("__nbr"), col("component")))
            .as("component"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      labels.unpersist()
      labels = next
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      i += 1
    }
    labels
  }

  /** Connected components by alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce
    * and Beyond") — the LONG-CHAIN scale path: rounds are O(log² n)
    * regardless of diameter, where plain min-label propagation needs
    * diameter rounds (a million-hop chain = a million joins).
    *
    *   large-star(u): m = min(Γ(u) ∪ {u}); hang every LARGER neighbor
    *     v > u off m.
    *   small-star(u): m = min(Γ⁻(u) ∪ {u}) over the not-larger
    *     neighbors Γ⁻(u) = {v ∈ Γ(u): v ≤ u}; hang Γ⁻(u) and u off m.
    *
    * Each step is one groupBy-min + one equi-join on the edge list —
    * the same shuffle shape as a propagation round, there are just far
    * fewer of them. At fixpoint the edge list IS the component map
    * (every node points at its component's minimum), so convergence ==
    * the edge multiset checksum (count + decimal endpoint sum) going
    * stable, one cheap two-row aggregate per round; the checksum is a
    * stand-in for set equality that GraphSpec backs with exact
    * equivalence tests against plain propagation. Per-round frames are
    * localCheckpointed for the same lineage reason as above. Returns
    * (id, component) — identical contract to connectedComponents.
    */
  def connectedComponentsStar(edges: DataFrame, aCol: String, bCol: String,
      maxIters: Int = 30): DataFrame = {
    val raw = edges
      .select(col(aCol).cast("long").as("a"), col(bCol).cast("long").as("b"))
    // nodes from the unfiltered input: a node seen only in self-pairs
    // is its own singleton component, same as the propagation variant
    val nodes = raw.select(col("a").as("id"))
      .union(raw.select(col("b").as("id"))).distinct()
      .localCheckpoint()
    val init = raw.filter(col("a") =!= col("b")).distinct()

    def sym(e: DataFrame): DataFrame =
      e.union(e.select(col("b").as("a"), col("a").as("b")))

    // one star step over the symmetric adjacency: hang the selected
    // neighbor set of every u off m(u)
    def star(e: DataFrame, large: Boolean): DataFrame = {
      val adj = sym(e)
      val mins = adj.groupBy(col("a"))
        .agg(min(col("b")).as("__nb"))
        .select(col("a"), least(col("a"), col("__nb")).as("m"))
      val joined = adj.join(mins, "a")
      val hung =
        if (large)
          joined.filter(col("b") > col("a"))
            .select(col("b").as("a"), col("m").as("b"))
        else
          joined.filter(col("b") <= col("a"))
            .select(col("b").as("a"), col("m").as("b"))
            .union(mins.select(col("a"), col("m").as("b")))
      hung.filter(col("a") =!= col("b")).distinct()
    }

    def checksum(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)).as("n"),
        sum(col("a").cast("decimal(38,0)") * 1000003L + col("b")).as("s"))
        .head
      (r.getLong(0), r.getDecimal(1))
    }

    var e = init.localCheckpoint()
    var prev = checksum(e)
    var converged = e.isEmpty
    var i = 0
    while (!converged && i < maxIters) {
      val next = star(star(e, large = true), large = false).localCheckpoint()
      val cs = checksum(next)
      e.unpersist()
      e = next
      converged = cs._1 == prev._1 && cs._2.compareTo(prev._2) == 0
      prev = cs
      i += 1
    }
    // fixpoint edges are (child -> component-min); component minima
    // themselves appear only on the right, and isolated self-pair
    // inputs appear in neither — label both with themselves
    nodes.join(e.select(col("a").as("id"), col("b").as("component")),
        Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Incremental components: merge a PRIOR assignment (id, component)
    * with a batch of NEW edges without rescanning the historical pair
    * list. The old assignment is itself a star-shaped edge set (every
    * node → its component min, diameter ≤ 2), so the union's size is
    * |V_old| + |E_new| — at dedup scale that replaces the full edge
    * history (quadratic-ish in corpus growth) with a frame linear in
    * the corpus. Correctness: old labels ARE node ids (each component's
    * minimum), so min-label propagation over the union converges to the
    * same minimum per merged component as a one-shot build over the
    * full history — `GraphSpec` pins incremental ≡ one-shot exactly.
    */
  def incrementalComponents(assign: DataFrame, newEdges: DataFrame,
      aCol: String, bCol: String, maxIters: Int = 20): DataFrame =
    connectedComponents(
      assign.select(col("id").as("a"), col("component").as("b"))
        .union(newEdges.select(col(aCol).cast("long").as("a"),
          col(bCol).cast("long").as("b"))),
      "a", "b", maxIters)
}
