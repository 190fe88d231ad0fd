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
}
