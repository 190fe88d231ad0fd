package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.WindowIndex

/** Differential fuzzing of the WindowIndex LIFECYCLE — the round-12
  * LSM redesign's state machine (per-batch window/manifest dirs, census
  * DELTAS merged at read and compacted inline past CensusCompactK, the
  * snapshot pointer, compact(), vacuum()) under RANDOM operation
  * sequences, where WindowIndexSpec pins fixed ones. Each trial
  * generates a corpus with planted duplicate structure (full copies,
  * shared prefixes, sub-window shorts), splits it into a random number
  * of batches WITH REDELIVERIES (later batches re-include earlier
  * docs — the exactly-once-by-anti-join contract), interleaves
  * compact() calls at random points (including immediately after
  * write and twice in a row), and ends with a full-corpus re-append
  * and a vacuum(0). After EVERY mutation the committed state must
  * equal the one-shot build over the unique docs delivered so far:
  *
  *   readWindows ≡ windows(unique docs)      (multiset)
  *   readDup     ≡ dupHashesOf(same)         (global dup criterion —
  *                 a later batch must be able to flip an old hash)
  *   readCensusCur ≡ censusOf(same)          (min/max doc per hash
  *                 exact through any delta/compaction history)
  *   readManifest ≡ distinct delivered ids   (incl. zero-window docs)
  *   censusDirCount ≤ CensusCompactK         (the LSM fan-in bound)
  *
  * One trial runs 12 batches so at least one inline census compaction
  * (K = 8) fires mid-sequence, not only via compact().
  */
class WindowIndexFuzzSpec extends SparkSpec {

  private def frameEq(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0

  /** Corpus with planted structure: ~1/4 full duplicates of an earlier
    * doc (same text, new id — every window hash goes dup), ~1/8 short
    * docs below the 5-token window floor (manifest-only), the rest
    * random token streams over a vocab small enough that some 5-grams
    * collide across docs by chance.
    */
  private def genDocs(rnd: scala.util.Random, n: Int): Seq[(Long, String,
      String, String)] = {
    val vocab = Vector.tabulate(30)(i => s"w$i")
    val langs = Vector("en", "de", "fr")
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String)]
    (0 until n).foreach { i =>
      val text =
        if (i > 0 && rnd.nextInt(4) == 0) out(rnd.nextInt(i))._4
        else if (rnd.nextInt(8) == 0)
          Seq.fill(rnd.nextInt(4) + 1)(vocab(rnd.nextInt(vocab.size)))
            .mkString(" ")
        else
          Seq.fill(rnd.nextInt(15) + 5)(vocab(rnd.nextInt(vocab.size)))
            .mkString(" ")
      out += ((i.toLong, langs(rnd.nextInt(langs.size)),
        s"src${rnd.nextInt(3)}", text))
    }
    out.toSeq
  }

  private def toDf(docs: Seq[(Long, String, String, String)]): DataFrame = {
    import spark.implicits._
    docs.toDF("doc_id", "lang", "source", "text")
  }

  test("random append/redeliver/compact/vacuum sequences equal the " +
      "one-shot build at every step") {
    val rnd = new scala.util.Random(20260816L)
    val trials = Seq(3, 4, 12, 5) // batch counts; 12 forces inline
    trials.zipWithIndex.foreach { case (nBatches, t) =>  // census compaction
      val docs = genDocs(rnd, 20 + rnd.nextInt(25))
      val dir = Files.createTempDirectory(s"graft-wifuzz-$t")
        .toString + "/idx"
      // random partition into nBatches slices (some may be empty)
      val sliceOf = docs.map(_ => rnd.nextInt(nBatches))
      def slice(b: Int) = docs.zip(sliceOf).collect {
        case (d, s) if s == b => d }
      val delivered = scala.collection.mutable
        .ArrayBuffer.empty[(Long, String, String, String)]
      def check(): Unit = {
        val uniq = delivered.distinctBy(_._1).toSeq
        val ref = toDf(uniq)
        val wins = WindowIndex.windows(ref)
        assert(frameEq(WindowIndex.readWindows(spark, dir), wins))
        assert(frameEq(WindowIndex.readDup(spark, dir),
          WindowIndex.dupHashesOf(wins)))
        assert(frameEq(WindowIndex.readCensusCur(spark, dir),
          WindowIndex.censusOf(wins)))
        assert(frameEq(WindowIndex.readManifest(spark, dir),
          ref.select(col("doc_id")).distinct()))
        assert(WindowIndex.censusDirCount(spark, dir) <=
          WindowIndex.CensusCompactK)
      }
      WindowIndex.write(toDf(slice(0)), dir)
      delivered ++= slice(0)
      check()
      (1 until nBatches).foreach { b =>
        // redelivery: with prob 1/3 the batch also re-includes a
        // random prefix of what was already delivered
        val redeliver =
          if (delivered.nonEmpty && rnd.nextInt(3) == 0)
            delivered.take(rnd.nextInt(delivered.size) + 1).toSeq
          else Nil
        WindowIndex.append(toDf(slice(b) ++ redeliver), dir)
        delivered ++= slice(b)
        if (rnd.nextInt(3) == 0) {
          // 1 = full rewrite, 2-4 = size-tiered (smallest dirs only)
          val mb = 1 + rnd.nextInt(4)
          WindowIndex.compact(spark, dir, mb)
          assert(WindowIndex.batchCount(spark, dir) <= mb.toLong)
          if (rnd.nextBoolean()) WindowIndex.compact(spark, dir, mb) // idem
        }
        check()
      }
      // full-corpus redelivery must be a committed no-op
      val nb = WindowIndex.batchCount(spark, dir)
      WindowIndex.append(toDf(delivered.toSeq), dir)
      assert(WindowIndex.batchCount(spark, dir) == nb)
      check()
      // vacuum(0): no concurrent reader here, so reclaiming every
      // unreferenced dir must leave the committed state untouched
      WindowIndex.vacuum(spark, dir, 0L)
      check()
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }
}
