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

  def evictAll(spark: SparkSession): Unit = {
    hooks.synchronized { hooks.toSeq }.foreach(_(spark))
    // Reliable-mode handoffs whose frames were dropped WITHOUT release
    // (a build that failed after materializing, a race-overwritten memo
    // entry) would otherwise orphan their parquet dirs forever — the
    // weak frame→path map can't see them once the frame is GC'd. The
    // sweep is TWO-PHASE: a path is deleted only when it is still
    // unreleased at a SECOND consecutive evictAll. A build in flight
    // during one eviction (builds run outside every lock by design)
    // keeps its handoff; by the next eviction it has either memoized —
    // the hooks above just released it — or died, and only then is the
    // dir reclaimed. This is exactly memoGet's documented contract
    // ("released at the next eviction").
    //
    // Liveness guard (ADVICE r8): "seen unreleased twice" alone is not
    // proof of death — a build that spans two evictions, or completes
    // between the hooks above and this sweep and THEN memoizes, still
    // holds its frame, and deleting the parquet dir under it turns the
    // next read into FileNotFoundException. A path whose frame is still
    // reachable in the weak frame→path map is LIVE: skip it and keep it
    // in the grace set (it is re-checked — and skipped again — for as
    // long as the frame stays reachable; once the frame is released or
    // GC'd the weak entry vanishes and the sweep reclaims the dir).
    val toDelete = pathsLock.synchronized {
      import scala.jdk.CollectionConverters._
      val current = Option(sessionPaths.get(spark))
        .map(_.asScala.toSet).getOrElse(Set.empty[String])
      val pending = Option(pendingSweep.get(spark))
        .map(_.asScala.toSet).getOrElse(Set.empty[String])
      val live = reliablePaths.synchronized {
        // Collections.synchronizedMap: iteration must hold the wrapper's
        // monitor. Nesting order is pathsLock → reliablePaths only (the
        // put/remove sites touch the two locks sequentially, never
        // nested the other way), so this cannot deadlock.
        val vs = Set.newBuilder[String]
        val it = reliablePaths.values.iterator()
        while (it.hasNext) vs += it.next()
        vs.result()
      }
      val dead = (current intersect pending) diff live
      Option(sessionPaths.get(spark)).foreach(s => dead.foreach(s.remove))
      val grace = new java.util.HashSet[String]()
      (current diff dead).foreach(grace.add)
      if (grace.isEmpty) pendingSweep.remove(spark)
      else pendingSweep.put(spark, grace)
      dead
    }
    toDelete.foreach(deletePath(spark, _))
  }

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
  def checkpointLarge(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.getOption(CkptModeKey).contains("reliable")) {
      // Cluster/fault-tolerant posture: a parquet handoff instead of
      // executor-local blocks. localCheckpoint ties every downstream
      // stage to the liveness of the executors holding the blocks —
      // acceptable in a single-JVM run, wrong on a 1000-executor
      // cluster where one lost node would fail the whole brick.
      // Parquet (vs RDD .checkpoint()) keeps the handoff columnar:
      // re-reads prune columns/filters like any table, and the
      // artifact is debuggable. Cost is one write+read of the frame
      // per materialization — measured in BENCH_LOCAL.md round 8.
      // `spark.graft.checkpoint.dir` accepts a COMMA LIST of dirs:
      // successive handoffs round-robin across them, spreading the
      // write+read bytes over independent disks. Motivation: the 30×
      // single-JVM profile's one super-linear wall stage
      // (activities.ckpt, ~6× at 3× data) was attributed to one
      // spindle serializing the handoff I/O — zero spill, linear
      // shuffle bytes (BENCH_LOCAL round 8). On a cluster the list
      // would be mount points; a single dir keeps the old behavior.
      val defaultBase =
        sys.props.getOrElse("java.io.tmpdir", "/tmp") + "/graft-ckpt"
      val configured = spark.conf.getOption(CkptDirKey).getOrElse(defaultBase)
        .split(',').map(_.trim).filter(_.nonEmpty)
      // ADVICE r9: a conf value that trims to zero entries ("" or ",")
      // must fall back to the default base, not mod-by-zero below
      val bases = if (configured.isEmpty) Array(defaultBase) else configured
      val base = bases(
        Math.floorMod(ckptRoundRobin.getAndIncrement(), bases.length))
      val path = s"$base/ckpt-${java.util.UUID.randomUUID()}"
      // zstd by default (`spark.graft.checkpoint.codec` overrides):
      // handoffs are write-once/read-once I/O-bound artifacts, and the
      // brick's canonical-JSON text compresses ~2× better under zstd
      // than snappy — at the fourth decade the activities handoff
      // alone is tens of GB, and the disk it occupies is the scratch
      // space the next stage's shuffle needs (round-11 finding).
      df.write.mode("overwrite")
        .option("compression",
          spark.conf.getOption(CkptCodecKey).getOrElse("zstd"))
        .parquet(path)
      val out = spark.read.parquet(path)
      reliablePaths.put(out, path)
      pathsLock.synchronized {
        var s = sessionPaths.get(spark)
        if (s == null) {
          s = new java.util.HashSet[String]()
          sessionPaths.put(spark, s): Unit
        }
        s.add(path): Unit
      }
      out
    } else df.localCheckpoint(true,
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
  }

  /** Build-outside-the-lock memo access (ADVICE r7): the synchronized
    * section only touches the map, so a long multi-job Spark build
    * never serializes unrelated keys/sessions — or a concurrent
    * `evictAll` — behind it. One builder per key is elected through an
    * in-flight future (the cachedBrick pattern); concurrent callers of
    * the SAME key block on that key's future only. A build that
    * overlaps an eviction of its own key lands in the map afterwards
    * and is released at the next eviction — same contract as
    * cachedBrick.
    */
  def memoGet[K, V](memo: scala.collection.mutable.Map[K, V],
      inflight: java.util.concurrent.ConcurrentHashMap[
        K, java.util.concurrent.CompletableFuture[V]],
      key: K)(build: => V): V =
    memo.synchronized(memo.get(key)) match {
      case Some(v) => v
      case None =>
        val fresh = new java.util.concurrent.CompletableFuture[V]()
        val prior = inflight.putIfAbsent(key, fresh)
        if (prior != null) prior.join()
        else try {
          // re-check under the lock AFTER winning the in-flight slot: a
          // racing builder may have completed (memo.update + inflight
          // .remove) between this thread's miss above and its
          // putIfAbsent — without this, the key would build twice and
          // the overwritten value's storage would leak unreleased
          val v = memo.synchronized(memo.get(key)).getOrElse {
            val built = build
            memo.synchronized { memo.update(key, built) }
            built
          }
          fresh.complete(v)
          v
        } catch {
          case t: Throwable => fresh.completeExceptionally(t); throw t
        } finally inflight.remove(key, fresh)
    }

  /** Conf knobs for the materialization posture: `local` (default —
    * executor-local checkpoint blocks, fastest, no fault tolerance) or
    * `reliable` (parquet handoff under `spark.graft.checkpoint.dir`,
    * survives executor loss; the dir should be durable storage on a
    * real cluster).
    */
  val CkptModeKey = "spark.graft.checkpoint.mode"
  val CkptDirKey = "spark.graft.checkpoint.dir"
  val CkptCodecKey = "spark.graft.checkpoint.codec"
  private val ckptRoundRobin = new java.util.concurrent.atomic.AtomicInteger(0)

  private val reliablePaths = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[DataFrame, String]())

  /** Per-session registry of every reliable handoff dir — the cleanup
    * backstop `evictAll` uses for paths whose frame never saw `release`
    * (the weak frame→path map alone would orphan those files). Keys are
    * WEAK: a session that stops without ever calling evictAll doesn't
    * pin itself (or its path strings) in memory for the JVM's lifetime.
    * `pendingSweep` holds each session's once-seen leftovers for the
    * two-phase eviction sweep. All access under `pathsLock`.
    */
  private val pathsLock = new Object
  private val sessionPaths =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()
  private val pendingSweep =
    new java.util.WeakHashMap[SparkSession, java.util.HashSet[String]]()

  private def deletePath(spark: SparkSession, path: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(p, true): Unit
  }

  /** Release one memoized frame: drop its CacheManager entry AND any
    * localCheckpoint blocks backing its plan leaves (unpersist alone
    * leaves those to the garbage collector). Reliable-mode handoff
    * frames delete their parquet dir instead.
    */
  def release(df: DataFrame): Unit = {
    Option(reliablePaths.remove(df)) match {
      case Some(path) =>
        pathsLock.synchronized {
          Option(sessionPaths.get(df.sparkSession)).foreach(_.remove(path))
          Option(pendingSweep.get(df.sparkSession)).foreach(_.remove(path))
        }
        deletePath(df.sparkSession, path)
      case None =>
        df.unpersist(blocking = false)
        org.apache.spark.sql.graftbridge.Bridge.freeCheckpointBlocks(df)
    }
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
