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
