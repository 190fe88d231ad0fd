package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.WindowIndex

/** The persisted window index: write/read identity against the pure
  * windows() definition, incremental-append ≡ one-shot-build, append
  * idempotence, the dup census staying globally correct across appends
  * (a new doc must be able to flip an OLD hash into dup status without
  * any text re-scan), the incremental census ≡ a full recompute, and
  * snapshot isolation — uncommitted (orphan/crashed) dirs are invisible
  * to every reader and reclaimed by vacuum.
  */
class WindowIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())

  private def frameEq(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  test("write round-trips the exact windows() and dupHashesOf() frames") {
    val dir = Files.createTempDirectory("graft-winidx").toString + "/idx"
    WindowIndex.write(docs, dir)
    assert(frameEq(WindowIndex.readWindows(spark, dir),
      WindowIndex.windows(docs)))
    assert(frameEq(WindowIndex.readDup(spark, dir),
      WindowIndex.dupHashesOf(WindowIndex.windows(docs))))
    // the manifest records every doc, including zero-window short docs
    assert(frameEq(WindowIndex.readManifest(spark, dir),
      docs.select(col("doc_id")).distinct()))
  }

  test("incremental appends equal the one-shot build; re-append is a no-op") {
    val a = docs.filter(col("doc_id") % 3 =!= 0)
    val b = docs.filter(col("doc_id") % 3 === 0)
    val incDir = Files.createTempDirectory("graft-winidx-i").toString + "/idx"
    val oneDir = Files.createTempDirectory("graft-winidx-o").toString + "/idx"
    WindowIndex.write(a, incDir)
    WindowIndex.append(b, incDir)
    WindowIndex.write(docs, oneDir)
    assert(frameEq(WindowIndex.readWindows(spark, incDir),
      WindowIndex.readWindows(spark, oneDir)))
    assert(frameEq(WindowIndex.readDup(spark, incDir),
      WindowIndex.readDup(spark, oneDir)))
    assert(WindowIndex.batchCount(spark, incDir) == 2L)
    // total redelivery of an already-appended batch changes nothing —
    // not even the committed batch count (no empty snapshot lands)
    WindowIndex.append(b, incDir)
    assert(WindowIndex.batchCount(spark, incDir) == 2L)
    assert(frameEq(WindowIndex.readWindows(spark, incDir),
      WindowIndex.readWindows(spark, oneDir)))
    assert(frameEq(WindowIndex.readDup(spark, incDir),
      WindowIndex.readDup(spark, oneDir)))
  }

  test("incrementally merged census equals a full recompute of windows/") {
    val dir = Files.createTempDirectory("graft-winidx-c").toString + "/idx"
    WindowIndex.write(docs.filter(col("doc_id") % 4 === 0), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 4 === 1), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 4 >= 2), dir)
    // the stored census is per-batch DELTAS merged at read; it must
    // equal the O(index) re-aggregate it replaces
    assert(WindowIndex.censusDirCount(spark, dir) == 3L)
    assert(frameEq(WindowIndex.readCensusCur(spark, dir),
      WindowIndex.censusOf(WindowIndex.readWindows(spark, dir))))
  }

  test("census LSM: delta fan-in stays bounded and compaction is exact") {
    import spark.implicits._
    // 2·(CensusCompactK+2) tiny docs appended one at a time — enough
    // appends to trip the census compaction twice. Pairs share a
    // 5-gram so the dup census is non-trivial across compactions.
    val n = 2 * (WindowIndex.CensusCompactK + 2)
    def doc(i: Int) = (i.toLong, "en", s"s$i",
      s"w${i / 2}a w${i / 2}b w${i / 2}c w${i / 2}d w${i / 2}e tail$i")
    val dir = Files.createTempDirectory("graft-winidx-lsm").toString + "/idx"
    WindowIndex.write(Seq(doc(0)).toDF("doc_id", "lang", "source", "text"),
      dir)
    for (i <- 1 until n) {
      WindowIndex.append(
        Seq(doc(i)).toDF("doc_id", "lang", "source", "text"), dir)
      // the LSM bound: never more than K census dirs in a snapshot
      assert(WindowIndex.censusDirCount(spark, dir) <=
        WindowIndex.CensusCompactK.toLong)
    }
    assert(WindowIndex.batchCount(spark, dir) == n.toLong)
    // delta-merged census across compaction generations ≡ full recompute
    assert(frameEq(WindowIndex.readCensusCur(spark, dir),
      WindowIndex.censusOf(WindowIndex.readWindows(spark, dir))))
    // every doc pair shares exactly one 5-gram → n/2 dup hashes
    assert(WindowIndex.readDup(spark, dir).count() == n / 2L)
  }

  test("compact rewrites to one batch + one census, result-identical") {
    val dir = Files.createTempDirectory("graft-winidx-k").toString + "/idx"
    WindowIndex.write(docs.filter(col("doc_id") % 3 === 0), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 3 === 1), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 3 === 2), dir)
    val wins = WindowIndex.readWindows(spark, dir).collect().toSet
    val mani = WindowIndex.readManifest(spark, dir).collect().toSet
    val dup = WindowIndex.readDup(spark, dir).collect().toSet
    WindowIndex.compact(spark, dir)
    assert(WindowIndex.batchCount(spark, dir) == 1L)
    assert(WindowIndex.censusDirCount(spark, dir) == 1L)
    assert(WindowIndex.readWindows(spark, dir).collect().toSet == wins)
    assert(WindowIndex.readManifest(spark, dir).collect().toSet == mani)
    assert(WindowIndex.readDup(spark, dir).collect().toSet == dup)
    // idempotent: a single-batch index is a no-op (no new dirs, same id)
    val before = WindowIndex.batchCount(spark, dir)
    WindowIndex.compact(spark, dir)
    assert(WindowIndex.batchCount(spark, dir) == before)
    // post-compaction appends still work and re-appends stay no-ops
    WindowIndex.append(docs.filter(col("doc_id") % 3 === 2), dir)
    assert(WindowIndex.batchCount(spark, dir) == 1L)
    assert(WindowIndex.readWindows(spark, dir).collect().toSet == wins)
  }

  test("tiered compaction merges only the smallest dirs down to the bound") {
    val dir = Files.createTempDirectory("graft-winidx-t").toString + "/idx"
    // one LARGE batch + four small ones: smallest-first merging must
    // leave the large run untouched on disk
    WindowIndex.write(docs.filter(col("doc_id") % 6 =!= 0), dir)
    (0 until 4).foreach { i =>
      WindowIndex.append(
        docs.filter(col("doc_id") % 24 === (i * 6).toLong), dir)
    }
    assert(WindowIndex.batchCount(spark, dir) == 5L)
    val wins = WindowIndex.readWindows(spark, dir).collect().toSet
    val mani = WindowIndex.readManifest(spark, dir).collect().toSet
    val dup = WindowIndex.readDup(spark, dir).collect().toSet
    // the biggest referenced batch dir before compaction
    val batchesDir = new java.io.File(s"$dir/batches")
    def dirSize(f: java.io.File): Long =
      java.nio.file.Files.walk(f.toPath).mapToLong(p =>
        if (java.nio.file.Files.isRegularFile(p)) p.toFile.length else 0L)
        .sum()
    val largest = batchesDir.listFiles().maxBy(dirSize).getName
    WindowIndex.compact(spark, dir, maxBatches = 3)
    assert(WindowIndex.batchCount(spark, dir) == 3L)
    assert(WindowIndex.readWindows(spark, dir).collect().toSet == wins)
    assert(WindowIndex.readManifest(spark, dir).collect().toSet == mani)
    assert(WindowIndex.readDup(spark, dir).collect().toSet == dup)
    // idempotent at the bound: no further rewrite
    WindowIndex.compact(spark, dir, maxBatches = 3)
    assert(WindowIndex.batchCount(spark, dir) == 3L)
    // vacuum(0) keeps exactly the REFERENCED dirs — the pre-compaction
    // largest run must still be among them (it was never a victim)
    WindowIndex.vacuum(spark, dir, 0L)
    val kept = batchesDir.listFiles().map(_.getName).toSet
    assert(kept.size == 3)
    assert(kept.contains(largest))
    assert(WindowIndex.readWindows(spark, dir).collect().toSet == wins)
  }

  /** The per-doc dup count recomputed the expensive way — the
    * window-scale mark-back join the dupc deltas replace. The v4 tests
    * pin deltas+corrections ≡ this on every topology.
    */
  private def dupCountsBrute(dir: String): org.apache.spark.sql.DataFrame =
    WindowIndex.readWindows(spark, dir)
      .join(WindowIndex.readDup(spark, dir), Seq("h"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_dup"))

  test("v4 dupc deltas: incremental ≡ one-shot ≡ brute recompute, " +
      "with retroactive flip corrections") {
    import spark.implicits._
    // doc 1 repeats its first 5-gram WITHIN the doc (tc=2 for that
    // hash while df=1) — the flip correction must credit BOTH
    // positions when doc 2 later duplicates the gram; docs 3/4 are
    // unique and short respectively
    val d1 = Seq(
      (1L, "en", "s1", "a b c d e a b c d e"),
      (3L, "fr", "s3", "p q r s t u")).toDF(
      "doc_id", "lang", "source", "text")
    val d2 = Seq(
      (2L, "en", "s2", "x a b c d e y"),
      (4L, "en", "s4", "too short")).toDF(
      "doc_id", "lang", "source", "text")
    val inc = Files.createTempDirectory("graft-winidx-d4i").toString + "/idx"
    val one = Files.createTempDirectory("graft-winidx-d4o").toString + "/idx"
    WindowIndex.write(d1, inc)
    // before the flip: nothing is dup, so no doc has a dupc row
    assert(WindowIndex.readDupCounts(spark, inc).count() == 0)
    WindowIndex.append(d2, inc)
    WindowIndex.write(d1.unionByName(d2), one)
    assert(frameEq(WindowIndex.readDupCounts(spark, inc),
      WindowIndex.readDupCounts(spark, one)))
    assert(frameEq(WindowIndex.readDupCounts(spark, inc),
      dupCountsBrute(inc)))
    // the retroactive credit: doc 1's TWO positions of the shared gram
    val m = WindowIndex.readDupCounts(spark, inc).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 2L, 2L -> 1L))
    // re-append idempotence extends to the new delta table
    WindowIndex.append(d2, inc)
    assert(frameEq(WindowIndex.readDupCounts(spark, inc),
      dupCountsBrute(inc)))
  }

  test("v4 dupc/docstats on the real corpus: appends ≡ recompute, " +
      "and compaction preserves both") {
    val dir = Files.createTempDirectory("graft-winidx-d4c").toString + "/idx"
    WindowIndex.write(docs.filter(col("doc_id") % 3 === 0), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 3 === 1), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 3 === 2), dir)
    assert(frameEq(WindowIndex.readDupCounts(spark, dir),
      dupCountsBrute(dir)))
    assert(frameEq(WindowIndex.readDocStats(spark, dir),
      WindowIndex.docStatsOf(docs)))
    val dc = WindowIndex.readDupCounts(spark, dir).collect().toSet
    val ds = WindowIndex.readDocStats(spark, dir).collect().toSet
    // tiered first (merges only the two smallest batch dirs' extras),
    // then the full rewrite — both must carry the merged tables
    WindowIndex.compact(spark, dir, maxBatches = 2)
    assert(WindowIndex.readDupCounts(spark, dir).collect().toSet == dc)
    assert(WindowIndex.readDocStats(spark, dir).collect().toSet == ds)
    WindowIndex.compact(spark, dir)
    assert(WindowIndex.batchCount(spark, dir) == 1L)
    assert(WindowIndex.readDupCounts(spark, dir).collect().toSet == dc)
    assert(WindowIndex.readDocStats(spark, dir).collect().toSet == ds)
  }

  /** Per-doc span stats recomputed the expensive way — the corpus-scale
    * dup-window sort the spans deltas replace (VERDICT r14 #3).
    */
  private def spanStatsBrute(dir: String): org.apache.spark.sql.DataFrame =
    WindowIndex.spanStatsOf(
      WindowIndex.readWindows(spark, dir)
        .join(WindowIndex.readDup(spark, dir), Seq("h"))
        .select(col("doc_id"), col("lang"), col("g")))

  test("v5 spans deltas: incremental ≡ one-shot ≡ brute recompute, " +
      "and a flip can MERGE a prior doc's islands") {
    import spark.implicits._
    // doc 1's windows: g=1..7 over 11 tokens. Batch 2 duplicates its
    // g=1 and g=7 windows (two separated spans, gap 6 > 4); batch 3
    // duplicates g=4 — the flip lands BETWEEN them (gaps 3 and 3 ≤ 4),
    // so doc 1's two spans must MERGE into one [1,7] removing 11 words.
    // This is exactly why spans are full-replacement recomputes, not
    // summable deltas.
    val d1 = Seq((1L, "en", "s1", "a b c d e x f g h i j"))
      .toDF("doc_id", "lang", "source", "text")
    val d2 = Seq((2L, "en", "s2", "a b c d e z0 z1 f g h i j"))
      .toDF("doc_id", "lang", "source", "text")
    val d3 = Seq((3L, "en", "s3", "d e x f g y0 y1 y2 y3"))
      .toDF("doc_id", "lang", "source", "text")
    val inc = Files.createTempDirectory("graft-winidx-s5i").toString + "/idx"
    val one = Files.createTempDirectory("graft-winidx-s5o").toString + "/idx"
    WindowIndex.write(d1, inc)
    assert(WindowIndex.readSpans(spark, inc).count() == 0)
    WindowIndex.append(d2, inc)
    // two separated spans for doc 1: 2 runs, removed = 2·5 words
    val mid = WindowIndex.readSpans(spark, inc)
      .filter(col("doc_id") === 1L).head()
    assert(mid.getAs[Long]("n_runs") == 2L &&
      mid.getAs[Long]("removed_words") == 10L)
    WindowIndex.append(d3, inc)
    WindowIndex.write(d1.unionByName(d2).unionByName(d3), one)
    assert(frameEq(WindowIndex.readSpans(spark, inc),
      WindowIndex.readSpans(spark, one)))
    assert(frameEq(WindowIndex.readSpans(spark, inc),
      spanStatsBrute(inc)))
    // the merged island: one span [1,7] = 11 words, three 1-window runs
    val m = WindowIndex.readSpans(spark, inc)
      .filter(col("doc_id") === 1L).head()
    assert(m.getAs[Long]("removed_words") == 11L)
    assert(m.getAs[Long]("n_runs") == 3L &&
      m.getAs[Long]("longest_run") == 1L)
    // re-append idempotence extends to the spans table
    WindowIndex.append(d3, inc)
    assert(frameEq(WindowIndex.readSpans(spark, inc), spanStatsBrute(inc)))
  }

  test("v5 spans on the real corpus: appends ≡ recompute, compaction " +
      "preserves the table") {
    val dir = Files.createTempDirectory("graft-winidx-s5c").toString + "/idx"
    WindowIndex.write(docs.filter(col("doc_id") % 3 === 0), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 3 === 1), dir)
    WindowIndex.append(docs.filter(col("doc_id") % 3 === 2), dir)
    assert(frameEq(WindowIndex.readSpans(spark, dir), spanStatsBrute(dir)))
    val sp = WindowIndex.readSpans(spark, dir).collect().toSet
    assert(sp.nonEmpty)
    WindowIndex.compact(spark, dir, maxBatches = 2)
    assert(WindowIndex.readSpans(spark, dir).collect().toSet == sp)
    WindowIndex.compact(spark, dir)
    assert(WindowIndex.batchCount(spark, dir) == 1L)
    assert(WindowIndex.readSpans(spark, dir).collect().toSet == sp)
  }

  test("v4-era (pre-spans) snapshots refuse append and readSpans, " +
      "but keep serving docstats/dupc") {
    import spark.implicits._
    val d1 = Seq((1L, "en", "s1", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "source", "text")
    val dir = Files.createTempDirectory("graft-winidx-v3e").toString + "/idx"
    WindowIndex.write(d1, dir)
    // forge a round-14-era pointer (marker v3: docstats/dupc exist,
    // spans don't — the dirs over it are a superset, which is fine:
    // the gate keys on the POINTER generation)
    val p = java.nio.file.Paths.get(s"$dir/_CURRENT")
    val lines = Files.readAllLines(p)
    lines.set(0, "v3")
    Files.write(p, lines)
    Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/._CURRENT.crc")): Unit
    assert(WindowIndex.readDocStats(spark, dir).count() > 0)
    assert(WindowIndex.readDupCounts(spark, dir).count() == 0)
    val e1 = intercept[IllegalArgumentException] {
      WindowIndex.readSpans(spark, dir).count()
    }
    assert(e1.getMessage.contains("rebuild"))
    val e2 = intercept[IllegalArgumentException] {
      WindowIndex.append(d1, dir)
    }
    assert(e2.getMessage.contains("rebuild"))
  }

  test("pre-v4 snapshots refuse append and the v4 readers, loudly") {
    import spark.implicits._
    val d1 = Seq((1L, "en", "s1", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "source", "text")
    val dir = Files.createTempDirectory("graft-winidx-old").toString + "/idx"
    WindowIndex.write(d1, dir)
    // forge a v2-era pointer over the same dirs (what a round-13 writer
    // would have committed): marker line downgraded, dirs untouched
    val p = java.nio.file.Paths.get(s"$dir/_CURRENT")
    val lines = Files.readAllLines(p)
    lines.set(0, "v2")
    Files.write(p, lines)
    // the nio rewrite bypasses Hadoop's ChecksumFileSystem — drop the
    // stale .crc sidecar so the forged pointer reads back
    Files.deleteIfExists(java.nio.file.Paths.get(s"$dir/._CURRENT.crc")): Unit
    // the v2-era readers still serve
    assert(WindowIndex.readWindows(spark, dir).count() > 0)
    assert(WindowIndex.batchCount(spark, dir) == 1L)
    // append and the v4 readers fail loudly instead of undercounting
    val e1 = intercept[IllegalArgumentException] {
      WindowIndex.append(d1, dir)
    }
    assert(e1.getMessage.contains("rebuild"))
    val e2 = intercept[IllegalArgumentException] {
      WindowIndex.readDupCounts(spark, dir).count()
    }
    assert(e2.getMessage.contains("rebuild"))
    val e3 = intercept[IllegalArgumentException] {
      WindowIndex.readDocStats(spark, dir).count()
    }
    assert(e3.getMessage.contains("rebuild"))
  }

  test("an appended doc flips an old hash into dup status (global census)") {
    import spark.implicits._
    val d1 = Seq((1L, "en", "s1", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "source", "text")
    val d2 = Seq((2L, "en", "s2", "alpha beta gamma delta epsilon eta"))
      .toDF("doc_id", "lang", "source", "text")
    val dir = Files.createTempDirectory("graft-winidx-f").toString + "/idx"
    WindowIndex.write(d1, dir)
    assert(WindowIndex.readDup(spark, dir).count() == 0)
    WindowIndex.append(d2, dir)
    // the shared 5-gram "alpha beta gamma delta epsilon" is now in two
    // distinct docs — the refreshed census sees it without re-reading d1
    assert(WindowIndex.readDup(spark, dir).count() == 1)
    val h = WindowIndex.readDup(spark, dir).head.getString(0)
    val ws = WindowIndex.readWindows(spark, dir)
      .filter(col("h") === h).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(ws == Set(1L, 2L))
  }

  test("uncommitted dirs are invisible to readers and reclaimed by vacuum") {
    import spark.implicits._
    val d1 = Seq((1L, "en", "s1", "alpha beta gamma delta epsilon zeta"))
      .toDF("doc_id", "lang", "source", "text")
    val dir = Files.createTempDirectory("graft-winidx-v").toString + "/idx"
    WindowIndex.write(d1, dir)
    val winsBefore = WindowIndex.readWindows(spark, dir).collect().toSet
    val dupBefore = WindowIndex.readDup(spark, dir).count()
    // simulate a maintainer that crashed mid-append: batch + census
    // dirs fully written but the pointer never flipped
    val orphan = Seq((9L, "en", "s9", "alpha beta gamma delta epsilon eta"))
      .toDF("doc_id", "lang", "source", "text")
    WindowIndex.windows(orphan)
      .write.parquet(s"$dir/batches/orphan-batch/windows")
    orphan.select(col("doc_id")).distinct()
      .write.parquet(s"$dir/batches/orphan-batch/manifest")
    WindowIndex.censusOf(WindowIndex.windows(orphan))
      .write.parquet(s"$dir/census/orphan-census")
    // snapshot isolation: every read resolves the committed pointer
    assert(WindowIndex.readWindows(spark, dir).collect().toSet == winsBefore)
    assert(WindowIndex.readDup(spark, dir).count() == dupBefore)
    assert(WindowIndex.batchCount(spark, dir) == 1L)
    // the default reader grace (1 h) protects young unreferenced dirs —
    // a reader holding the prior snapshot (or an in-flight append's
    // not-yet-referenced dirs) survives a default vacuum (ADVICE r11)
    WindowIndex.vacuum(spark, dir)
    assert(Files.exists(java.nio.file.Paths.get(
      s"$dir/batches/orphan-batch")))
    // vacuum with no grace removes exactly the unreferenced dirs; the
    // index still reads
    WindowIndex.vacuum(spark, dir, maxAgeMs = 0L)
    assert(!Files.exists(java.nio.file.Paths.get(
      s"$dir/batches/orphan-batch")))
    assert(!Files.exists(java.nio.file.Paths.get(
      s"$dir/census/orphan-census")))
    assert(WindowIndex.readWindows(spark, dir).collect().toSet == winsBefore)
    // and the crashed maintenance can simply be retried afterwards
    WindowIndex.append(orphan, dir)
    assert(WindowIndex.readDup(spark, dir).count() == 1)
  }
}
