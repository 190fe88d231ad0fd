package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.WindowIndex

/** Streaming maintenance of the persisted window index — the batch
  * `WindowIndex.append` driven by Structured Streaming: new documents
  * arrive as parquet files in a watched directory and each micro-batch
  * appends their windows + the merged dup census via `foreachBatch`.
  * The r11 snapshot redesign is what makes this viable as a STANDING
  * job: each append is O(batch + census) — window work tracks the
  * arrival rate, never the index size — and commits atomically through
  * the pointer flip, so concurrent dedup readers always see a complete
  * snapshot mid-stream.
  *
  * Exactly-once BY IDEMPOTENCE (the IndexStreamJob contract):
  * `foreachBatch` delivers at-least-once, and `append`'s manifest
  * anti-join makes a replayed batch a no-op — nothing commits, not
  * even an empty snapshot. Micro-batches of ONE query run
  * sequentially, which is exactly the index's single-writer
  * requirement; do not point two streams at one index path.
  * `WindowIndexStreamSpec` pins stream-appended ≡ batch-built (windows
  * AND dup census) and replay-changes-nothing.
  *
  * Format-migration note (ADVICE r14): `append` hard-fails on any
  * index whose pointer predates the CURRENT table set (census v4's
  * df/tc/docstats/dupc, and the round-15 spans table), so a standing
  * stream resumed over an old index fails EVERY micro-batch — loud by
  * design, but operationally breaking. Before resuming such a stream,
  * rebuild the index once with `WindowIndex.write(allDocs, path)` (ids
  * are content-derived, so the rebuild is bit-identical plus the new
  * tables); the stream then appends normally.
  *
  * Batch dirs accumulate one per non-empty micro-batch — on a standing
  * stream that is thousands of dirs after weeks, and every
  * `readWindows` unions them all. `compactEvery = Some(n)` bounds it:
  * whenever the committed batch count reaches n the job runs a
  * SIZE-TIERED `WindowIndex.compact(maxBatches = n/2)` — only the
  * smallest dirs merge, so the periodic rewrite is proportional to
  * the recent small batches, NOT the whole index (a full rewrite
  * every n batches amortizes to O(index/n) per batch and grows with
  * the corpus; smallest-first merging rewrites a row O(log(index/
  * batch)) times over its lifetime). The dir count then oscillates in
  * [n/2, n]. The pointer flip keeps concurrent dedup readers
  * snapshot-safe; the compaction is idempotent and result-identical
  * (WindowIndexSpec), so a micro-batch replayed around a crash
  * between append and compact converges to the same index either way.
  * Old dirs are reclaimed by the age-gated `WindowIndex.vacuum`, not
  * here — a reader may hold the prior snapshot.
  */
object WindowIndexStreamJob {

  /** The documents-table schema (TESTDATA.md): file streams need an
    * explicit schema — there is no inference on a watched directory.
    */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** `vacuumAgeMs`: when set, every compaction is followed by an
    * age-gated `WindowIndex.vacuum` sweep of the dirs it (and prior
    * appends) unreferenced — without it a standing stream's disk
    * footprint grows forever even though the POINTER stays bounded.
    * The age must comfortably exceed the longest concurrent reader's
    * lifetime (vacuum's reader-grace contract); there is no safe
    * library default, which is why this is opt-in like compactEvery.
    */
  def run(spark: SparkSession, docDir: String, indexPath: String,
      checkpointDir: String, trigger: Trigger,
      maxFilesPerTrigger: Option[Int] = None,
      compactEvery: Option[Int] = None,
      vacuumAgeMs: Option[Long] = None): StreamingQuery = {
    compactEvery.foreach(n => require(n >= 2,
      s"compactEvery must be >= 2 (got $n): compacting at every batch " +
        "would rewrite the whole index per micro-batch"))
    require(vacuumAgeMs.isEmpty || compactEvery.nonEmpty,
      "vacuumAgeMs without compactEvery has nothing to sweep on a " +
        "pure-append stream (appends only add dirs); set compactEvery")
    val reader = spark.readStream.schema(docSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(docDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          WindowIndex.append(batch, indexPath)
          // batchCount is one pointer-file read — cheap per micro-batch
          compactEvery.foreach { n =>
            if (WindowIndex.batchCount(spark, indexPath) >= n) {
              WindowIndex.compact(spark, indexPath,
                maxBatches = math.max(1, n / 2))
              vacuumAgeMs.foreach(age =>
                WindowIndex.vacuum(spark, indexPath, age))
            }
          }
      }
      .start()
  }

  /** `runMain graft.streaming.WindowIndexStreamJob <docDir> <indexPath>`
    * — drains everything currently in `docDir` into the index at
    * `indexPath` (which must already exist via `WindowIndex.write`)
    * and exits.
    */
  def main(args: Array[String]): Unit = {
    val Array(docDir, indexPath) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus, "winidx-stream")
    spark.sparkContext.setLogLevel("WARN")
    val q = run(spark, docDir, indexPath,
      s"$indexPath/_stream_checkpoint", Trigger.AvailableNow())
    q.awaitTermination()
    spark.stop()
  }
}
