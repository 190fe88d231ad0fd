package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distributed spherical k-means (Lloyd iterations) — the IVF coarse
  * quantizer TRAINER (the ann4-ann6 queries consume centroids; this is
  * where they come from when no labels exist).
  *
  * Shape per iteration: the K centroids broadcast to every task,
  * assignment is a map-side argmax (row_number over a per-vector
  * window, ties to the lowest cid — deterministic), and the new
  * centroids are decimal-exact positional means (partial-aggregated
  * map-side, one narrow shuffle of K×dim cells). The corpus itself
  * never shuffles for assignment — the layout that scales to 100 TB
  * with K in the thousands. For many iterations at scale, checkpoint
  * the centroid frame every few rounds to cut lineage; at the 1-3
  * iterations IVF training needs, plain chaining is fine.
  *
  * Determinism (SURVEY §4 decision 2 applied to ML): seeded/fixed init,
  * exact decimal sums for the means, total-order tie-breaks — identical
  * centroids on any partitioning, which is what lets the DuckDB oracle
  * replay a full training round (ann7).
  */
object KMeans {

  /** Seeded hash-min init: the k rows with the lowest
    * xxhash64(id, seed) become the initial centroids — deterministic on
    * any partitioning, no RNG state, and the pick is a
    * TakeOrderedAndProject (never a global sort). Shared by
    * `IvfPqIndex.trainCoarse` and dd10's scale-grown blocking so the
    * init discipline can't silently diverge between them.
    */
  def hashMinInit(vecs: DataFrame, k: Int, idCol: String,
      vecCol: String, seed: Long = 7L): DataFrame =
    vecs.orderBy(xxhash64(col(idCol), lit(seed)), col(idCol))
      .limit(k)
      .select(col(idCol).as("cid"), col(vecCol).as("cv"))

  /** Assign every vector to its best centroid by cosine similarity.
    * `cents`: (cid, cv: array<double>). Requires
    * `GraftFunctions.register` (native cosine_sim) on the session.
    * Output: vecs' columns + `cid`.
    */
  def assign(vecs: DataFrame, cents: DataFrame, idCol: String,
      vecCol: String): DataFrame = {
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("__ccos").desc, col("cid"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("__ccos", expr(s"cosine_sim($vecCol, cv)"))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__ccos", "__rk", "cv")
  }

  /** Decimal-exact positional mean per cluster → (cid, cv). Clusters
    * that lost all members drop out (both engines agree on this).
    */
  def meanCentroids(assigned: DataFrame, vecCol: String): DataFrame =
    assigned.select(col("cid"), posexplode(col(vecCol)))
      .groupBy(col("cid"), col("pos"))
      .agg((sum(col("col").cast(DecimalType(27, 12))).cast("double") /
        count(lit(1))).as("c"))
      .groupBy(col("cid"))
      .agg(expr("transform(sort_array(collect_list(struct(pos, c))), " +
        "x -> x.c)").as("cv"))

  /** `iters` full Lloyd rounds from `init` (cid, cv) → trained
    * centroids.
    */
  def lloyd(vecs: DataFrame, init: DataFrame, idCol: String,
      vecCol: String, iters: Int): DataFrame =
    (1 to iters).foldLeft(init) { (cents, _) =>
      meanCentroids(assign(vecs, cents, idCol, vecCol), vecCol)
    }
}
