package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.WindowIndex
import graft.streaming.WindowIndexStreamJob

/** Streaming window-index maintenance (streaming/WindowIndexStreamJob):
  * per-batch `WindowIndex.append` under `foreachBatch`. Pins the two
  * identities the job's exactly-once-by-idempotence contract rests on:
  *
  *   1. stream-appended index ≡ one-shot batch build on the same
  *      corpus — window rows, manifest, AND the merged dup census;
  *   2. replaying EVERY file against the already-complete index (a
  *      fresh checkpoint simulates total delivery replay, the worst
  *      case of foreachBatch's at-least-once semantics) changes
  *      nothing — not even the committed batch count.
  */
class WindowIndexStreamSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def indexState(path: String): (Seq[String], Seq[String]) = (
    sortedRows(WindowIndex.readWindows(spark, path)),
    sortedRows(WindowIndex.readDup(spark, path)))

  test("stream-appended window index equals the batch twin; replay no-op") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-winidx-stream").toString
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val isNew = col("doc_id") % 3 === 0
    val base = docs.filter(!isNew)
    val delta = docs.filter(isNew)

    WindowIndex.write(base, s"$root/stream")
    // batch twin: everything in one shot — the census the stream's
    // per-batch merges must land on exactly
    WindowIndex.write(docs, s"$root/batch")

    // three arrival files so maxFilesPerTrigger=1 exercises multiple
    // sequential micro-batches (the single-writer regime)
    for (part <- 0 to 2)
      delta.filter(pmod(col("doc_id"), lit(9)) === part * 3)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/arrivals/part=$part")
    val q1 = WindowIndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/stream", s"$root/ckpt1", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1))
    q1.awaitTermination()

    val batchState = indexState(s"$root/batch")
    val streamState = indexState(s"$root/stream")
    assert(streamState._1 == batchState._1, "window rows diverged")
    assert(streamState._2 == batchState._2, "dup census diverged")
    assert(streamState._1.nonEmpty)
    assert(sortedRows(WindowIndex.readManifest(spark, s"$root/stream")) ==
      sortedRows(WindowIndex.readManifest(spark, s"$root/batch")))

    // total replay against the complete index: manifest idempotence
    // must commit nothing — same rows, same census, same batch count
    val nBatches = WindowIndex.batchCount(spark, s"$root/stream")
    val q2 = WindowIndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/stream", s"$root/ckpt2", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1))
    q2.awaitTermination()
    assert(indexState(s"$root/stream") == streamState,
      "replaying all arrivals mutated the index")
    assert(WindowIndex.batchCount(spark, s"$root/stream") == nBatches,
      "a replayed no-op batch committed a snapshot")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("mid-stream compaction: compacted stream ≡ uncompacted twin") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-winidx-compact").toString
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val isNew = col("doc_id") % 3 === 0
    WindowIndex.write(docs.filter(!isNew), s"$root/plain")
    WindowIndex.write(docs.filter(!isNew), s"$root/compacted")
    for (part <- 0 to 2)
      docs.filter(isNew).filter(pmod(col("doc_id"), lit(9)) === part * 3)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/arrivals/part=$part")
    // same arrivals, one stream compacting whenever 2 batch dirs have
    // accumulated (so compaction fires repeatedly MID-stream, between
    // micro-batches readers can land on), one never compacting
    val qp = WindowIndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/plain", s"$root/ckpt-p", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1))
    val qc = WindowIndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/compacted", s"$root/ckpt-c", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1), compactEvery = Some(2))
    qp.awaitTermination(); qc.awaitTermination()
    assert(indexState(s"$root/compacted") == indexState(s"$root/plain"),
      "compaction changed reader-visible state")
    assert(sortedRows(WindowIndex.readManifest(spark, s"$root/compacted")) ==
      sortedRows(WindowIndex.readManifest(spark, s"$root/plain")))
    // the point of compaction: the dir list is bounded, not one per batch
    assert(WindowIndex.batchCount(spark, s"$root/compacted") <= 2L)
    assert(WindowIndex.batchCount(spark, s"$root/plain") == 4L)
    // replay against the compacted index stays a no-op (manifest kept)
    val st = indexState(s"$root/compacted")
    val nb = WindowIndex.batchCount(spark, s"$root/compacted")
    val qr = WindowIndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/compacted", s"$root/ckpt-r", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1), compactEvery = Some(2))
    qr.awaitTermination()
    assert(indexState(s"$root/compacted") == st)
    assert(WindowIndex.batchCount(spark, s"$root/compacted") == nb)
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }

  test("stream vacuum sweeps unreferenced dirs without changing state") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-winidx-vac").toString
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val isNew = col("doc_id") % 3 === 0
    WindowIndex.write(docs.filter(!isNew), s"$root/idx")
    WindowIndex.write(docs.filter(!isNew), s"$root/twin")
    for (part <- 0 to 2)
      docs.filter(isNew).filter(pmod(col("doc_id"), lit(9)) === part * 3)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/arrivals/part=$part")
    val q = WindowIndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/idx", s"$root/ckpt", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1), compactEvery = Some(2),
      vacuumAgeMs = Some(0L))
    val qt = WindowIndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/twin", s"$root/ckpt-t", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination(); qt.awaitTermination()
    // reader-visible state identical to the never-compacted twin
    assert(indexState(s"$root/idx") == indexState(s"$root/twin"))
    // and the DISK now holds exactly the referenced dirs — compaction
    // victims and superseded census deltas were swept mid-stream
    def onDisk(sub: String): Long =
      Option(new java.io.File(s"$root/idx/$sub").listFiles())
        .map(_.count(_.isDirectory).toLong).getOrElse(0L)
    assert(onDisk("batches") ==
      WindowIndex.batchCount(spark, s"$root/idx"))
    assert(onDisk("census") ==
      WindowIndex.censusDirCount(spark, s"$root/idx"))
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }
}
