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
    // the stored census was merged O(batch + |census|) per append; it
    // must equal the O(index) re-aggregate it replaces
    assert(frameEq(WindowIndex.readCensusCur(spark, dir),
      WindowIndex.censusOf(WindowIndex.readWindows(spark, dir))))
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
    // vacuum removes exactly the unreferenced dirs; the index still reads
    WindowIndex.vacuum(spark, dir)
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
