package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.operators.IvfPqIndex
import graft.streaming.SearchStreamJob

/** Streaming serving (streaming/SearchStreamJob): per-batch
  * `IvfPqIndex.search` under `foreachBatch` with dynamic
  * partition-overwrite as the exactly-once mechanism. Pins:
  *
  *   1. streamed search results ≡ the batch `search` over the same
  *      query set (modulo the batch_id bookkeeping column);
  *   2. a total replay (fresh checkpoint, same arrivals, same output
  *      dir) leaves the result set IDENTICAL — each replayed batch
  *      overwrites its own partition instead of appending duplicates.
  */
class SearchStreamSpec extends SparkSpec {

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq.sorted

  test("streamed search equals batch search; total replay adds nothing") {
    graft.functions.GraftFunctions.register(spark)
    val root = java.nio.file.Files
      .createTempDirectory("graft-search-stream").toString
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
    IvfPqIndex.write(e, s"$root/idx", k = 8)

    // the arriving queries: 9 vectors over three files so
    // maxFilesPerTrigger=1 exercises multiple micro-batches
    val queries = e.filter(col("vec_id") < 9)
    for (part <- 0 to 2)
      queries.filter(pmod(col("vec_id"), lit(3)) === part)
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$root/queries/part=$part")

    val q1 = SearchStreamJob.run(spark, s"$root/queries", s"$root/idx",
      s"$root/out", s"$root/ckpt1", Trigger.AvailableNow(),
      k = 3, nprobe = 2, maxFilesPerTrigger = Some(1))
    q1.awaitTermination()

    val streamed = spark.read.parquet(s"$root/out").drop("batch_id")
    val batch = IvfPqIndex.search(spark, s"$root/idx", e,
      col("vec_id") < 9, k = 3, nprobe = 2)
    assert(sortedRows(streamed) == sortedRows(batch),
      "streamed results diverged from the batch search")
    assert(streamed.count() > 0)

    // total replay: fresh checkpoint re-delivers every query file into
    // the SAME output dir — partition overwrite must keep the result
    // ROWS identical (no duplicates, no lost batches). batch_id is
    // excluded: a fresh checkpoint may number/group the same files
    // differently, which moves rows between partitions without
    // changing what a reader sees — duplicates would still surface as
    // row multiplicity.
    val before = sortedRows(spark.read.parquet(s"$root/out")
      .drop("batch_id"))
    val q2 = SearchStreamJob.run(spark, s"$root/queries", s"$root/idx",
      s"$root/out", s"$root/ckpt2", Trigger.AvailableNow(),
      k = 3, nprobe = 2, maxFilesPerTrigger = Some(1))
    q2.awaitTermination()
    assert(sortedRows(spark.read.parquet(s"$root/out")
      .drop("batch_id")) == before,
      "replaying all query files mutated the served results")

    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(root))
  }
}
