package graft

import graft.harmonize.Harmonize
import graft.sources.SourceAdapter

/** Soak test for memo eviction (VERDICT r4 #5): MemoEvictionSpec proves
  * ONE evict/rebuild cycle; a long-lived service (Thrift server,
  * notebook kernel, streaming driver) cycles indefinitely. N cycles must
  * hold two invariants the single-cycle test can't see:
  *
  *   - FLAT STORAGE: the persistent-RDD census after every evict returns
  *     to the same level — no leaked checkpoint blocks, no memo map
  *     entries surviving eviction and re-registering duplicates;
  *   - BIT-IDENTICAL RESULTS: every cycle's rebuild reproduces the same
  *     aggregates (content-addressed ids make this a hard equality).
  *
  * The per-cycle workload deliberately crosses memo layers: the brick
  * (Harmonize memo + staging memos underneath) plus a dedup query
  * (shingle/candidate memos) — the layering is where a stale cross-
  * reference would leak.
  */
class MemoSoakSpec extends SparkSpec {

  private def persistentCount: Int =
    spark.sparkContext.getPersistentRDDs.size

  test("five evict/rebuild cycles: flat storage, identical results") {
    val d = sf()
    // ann8/ann9 exercise the quantizer artifact memos
    // (ScalarQuantIndex.cachedDecoded, ProductQuantIndex.cached) AND the
    // eager release of PQ training-intermediate checkpoints inside
    // build() — a leak there shows up as a rising post-evict census
    def build(): (Long, Long, Long, Long, Long) = {
      val b = Harmonize.cachedBrick(spark, d, SourceAdapter.all)
      (b.activities.count(),
        b.substances.count(),
        SparkEntry.queries("dd3_minhash_lsh")(spark, d).count(),
        SparkEntry.queries("ann8_scalar_quant")(spark, d).count(),
        SparkEntry.queries("ann9_product_quant")(spark, d).count())
    }
    // cycle 0 establishes the baselines
    val expected = build()
    MemoRegistry.evictAll(spark)
    val floorAfterEvict = persistentCount

    (1 to 5).foreach { cycle =>
      val r = build()
      assert(r == expected, s"cycle $cycle diverged: $r vs $expected")
      MemoRegistry.evictAll(spark)
      val now = persistentCount
      assert(now <= floorAfterEvict,
        s"cycle $cycle leaked storage: floor $floorAfterEvict, now $now")
    }
  }
}
