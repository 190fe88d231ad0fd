package graft

import graft.harmonize.Harmonize
import graft.sources.SourceAdapter

/** MemoRegistry eviction: a long-lived session can release every
  * session-scoped memoized frame (brick checkpoints, staged triplets,
  * shingle/candidate/centroid caches) and rebuild bit-identically —
  * content-addressed ids make eviction invisible to results.
  */
class MemoEvictionSpec extends SparkSpec {

  private def persistentCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("evictAll releases memoized storage and rebuild is identical") {
    val d = sf()
    def build(): (Long, Long, Long) = {
      val b = Harmonize.cachedBrick(spark, d, SourceAdapter.all)
      (b.activities.count(),
        SparkEntry.queries("dd3_minhash_lsh")(spark, d).count(),
        SparkEntry.queries("x6_bigram_lm")(spark, d).count())
    }
    val r1 = build()
    val nBuilt = persistentCount
    MemoRegistry.evictAll(spark)
    val nEvicted = persistentCount
    // the brick checkpoints, staging persists, and query memos are gone
    assert(nEvicted < nBuilt, s"evict freed nothing: $nBuilt -> $nEvicted")

    // rebuild after evict: same results (content-addressed ids), and a
    // second evict returns storage to the same level — no growth across
    // repeated evict/build cycles
    val r2 = build()
    assert(r2 == r1, s"$r2 vs $r1")
    MemoRegistry.evictAll(spark)
    assert(persistentCount <= nEvicted,
      s"storage grew across cycles: $nEvicted -> $persistentCount")
  }

  test("eviction is scoped to the session (other sessions untouched)") {
    val d = sf()
    Harmonize.cachedBrick(spark, d, SourceAdapter.all).activities.count()
    val other = spark.newSession()
    // evicting through a DIFFERENT session must not drop this one's memo:
    // the brick frame is still served from storage (same object identity)
    val before = Harmonize.cachedBrick(spark, d, SourceAdapter.all)
    Harmonize.evict(other)
    val after = Harmonize.cachedBrick(spark, d, SourceAdapter.all)
    assert(before.activities eq after.activities)
    MemoRegistry.evictAll(spark)
  }
}
