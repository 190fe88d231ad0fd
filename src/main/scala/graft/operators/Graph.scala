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
}
