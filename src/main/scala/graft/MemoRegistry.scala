package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Central eviction for session-scoped memoized frames.
  *
  * The Verify/Bench lifecycle builds every memo (brick, staged triplets,
  * shingles, candidate indexes, centroids…) once and exits, so the
  * memos hold their storage for exactly one driver run. A LONG-LIVED
  * session, though, would accumulate persisted frames forever — this
  * registry is the unpersist hook such a service calls between
  * workloads. Each memo site registers an eviction callback at
  * class-load; `evictAll(spark)` releases and forgets everything
  * memoized FOR THAT SESSION (other sessions' entries are untouched),
  * after which the next access rebuilds bit-identically — every id in
  * the engine is a content hash, so eviction can never change results
  * (MemoEvictionSpec proves rebuild equality and storage reclamation).
  */
object MemoRegistry {
  private val hooks =
    scala.collection.mutable.ArrayBuffer.empty[SparkSession => Unit]

  def register(hook: SparkSession => Unit): Unit =
    hooks.synchronized { hooks += hook }

  def evictAll(spark: SparkSession): Unit =
    hooks.synchronized { hooks.toSeq }.foreach(_(spark))

  /** Eager localCheckpoint at MEMORY_AND_DISK_SER — the storage level
    * for LARGE memoized fact frames (staging triplets, brick assembly
    * intermediates, brick tables). The default deserialized level keeps
    * one UnsafeRow copy + object header per row resident; serialized
    * blocks are one compact buffer per partition, several times
    * smaller. That footprint is the difference between the brick
    * assembly aggregating with free execution memory and spilling:
    * at the 10× stretch on a 16 GB heap the resident staging blocks
    * starved the pre-collapse aggregation into 4 GB of spill and a 44×
    * sub-stage blow-up (AssemblyProfile/AggProbe, round 7) — with
    * serialized blocks the same stage is near-linear at the same heap.
    * Small frames (per-round component labels, centroid tables, query
    * slices) stay on the default level where per-read deserialization
    * would cost more than the footprint saves.
    */
  def checkpointLarge(df: DataFrame): DataFrame =
    df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)

  /** Release one memoized frame: drop its CacheManager entry AND any
    * localCheckpoint blocks backing its plan leaves (unpersist alone
    * leaves those to the garbage collector).
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    org.apache.spark.sql.graftbridge.Bridge.freeCheckpointBlocks(df)
  }

  /** Evict a session's entries from one memo map: remove every key whose
    * first component is `spark` and release each removed frame.
    */
  def evictMap[K, V](spark: SparkSession,
      memo: scala.collection.mutable.Map[K, V])(
      sessionOf: K => SparkSession)(frames: V => Seq[DataFrame]): Unit =
    memo.synchronized {
      memo.keys.filter(k => sessionOf(k) eq spark).toSeq.foreach { k =>
        memo.remove(k).toSeq.flatMap(frames).foreach(release)
      }
    }
}
