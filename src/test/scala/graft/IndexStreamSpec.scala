package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.IvfPqIndex
import graft.streaming.IndexStreamJob

/** Streaming index maintenance (streaming/IndexStreamJob): per-batch
  * `IvfPqIndex.append` under `foreachBatch`. Pins the two identities
  * the job's exactly-once-by-idempotence contract rests on:
  *
  *   1. stream-appended index ≡ batch-appended index on the same
  *      corpus — lists, codes, AND the nprobe search result;
  *   2. replaying EVERY file against the already-complete index (a
  *      fresh checkpoint simulates total delivery replay, the worst
  *      case of foreachBatch's at-least-once semantics) changes
  *      nothing.
  */
class IndexStreamSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  private def indexState(path: String): (Seq[String], Seq[String]) = (
    sortedRows(spark.read.parquet(s"$path/lists")),
    sortedRows(spark.read.parquet(s"$path/pq/codes")))

  test("stream-appended index equals the batch twin, replay is a no-op") {
    graft.functions.GraftFunctions.register(spark)
    val root = java.nio.file.Files
      .createTempDirectory("graft-idx-stream").toString
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    val isDelta = col("vec_id") % 10 === 7
    val base = e.filter(!isDelta)
    val delta = e.filter(isDelta)

    // two identical base artifacts: batch twin and stream target
    IvfPqIndex.write(base, s"$root/batch", k = 8)
    IvfPqIndex.write(base, s"$root/stream", k = 8)

    // batch twin: one-shot append
    IvfPqIndex.append(delta, s"$root/batch")

    // the stream's arrivals: three files so maxFilesPerTrigger=1
    // exercises multiple micro-batches
    for (part <- 0 to 2)
      delta.filter(pmod(col("vec_id"), lit(3)) === part)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/arrivals/part=$part")
    val q1 = IndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/stream", s"$root/ckpt1", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1))
    q1.awaitTermination()

    val batchState = indexState(s"$root/batch")
    val streamState = indexState(s"$root/stream")
    assert(streamState._1 == batchState._1, "lists diverged")
    assert(streamState._2 == batchState._2, "codes diverged")
    assert(streamState._1.nonEmpty && streamState._2.nonEmpty)

    // search parity off the two artifacts (the consumer-visible check)
    def hits(p: String): Seq[String] = sortedRows(IvfPqIndex.search(
      spark, p, e, col("vec_id") < 10, k = 3, nprobe = 2))
    assert(hits(s"$root/stream") == hits(s"$root/batch"))

    // total replay: a FRESH checkpoint re-delivers every arrival file
    // against the already-complete index — append idempotence must
    // make the whole rerun a no-op
    val q2 = IndexStreamJob.run(spark, s"$root/arrivals",
      s"$root/stream", s"$root/ckpt2", Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1))
    q2.awaitTermination()
    assert(indexState(s"$root/stream") == streamState,
      "replaying all arrivals mutated the index")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }
}
