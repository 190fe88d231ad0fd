package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.IvfPqIndex

/** Streaming SERVING against a persisted IVF-PQ index — the other half
  * of the index lifecycle ([[IndexStreamJob]] maintains the artifact;
  * this job answers with it): query vectors arrive as parquet files in
  * a watched directory, each micro-batch runs the batch
  * `IvfPqIndex.search` (fused probe selection, broadcast probe join,
  * ADC over the probed lists' codes) and lands (query_id, rank,
  * neighbor_id, score) under the output directory.
  *
  * Exactly-once BY PARTITION OVERWRITE, not by idempotent append (the
  * IndexStreamJob trick doesn't apply — search RESULTS have no
  * anti-joinable identity in the sink): each micro-batch writes its
  * rows into a `batch_id=<epoch>` partition with dynamic partition
  * overwrite, so a replayed batch (foreachBatch is at-least-once)
  * overwrites its own partition with identical rows instead of
  * duplicating them. Readers see ONE row set per delivered batch
  * regardless of replays — `SearchStreamSpec` pins stream ≡ batch
  * results and replay-idempotence, the same two identities the
  * maintenance job pins.
  *
  * Scale shape per micro-batch: cost tracks the ARRIVAL rate times
  * probed-list occupancy — the index's corpus-scale tables are touched
  * only through the probe equi-join (lists) and the candidate join
  * (codes); corpus vectors are never read. The per-batch query count
  * must respect the bounded-query contract of the ADC scorer (≤ 4096 —
  * enforced loudly there); bound arrivals with `maxFilesPerTrigger`.
  */
object SearchStreamJob {

  def run(spark: SparkSession, queryDir: String, indexPath: String,
      outDir: String, checkpointDir: String, trigger: Trigger,
      k: Int, nprobe: Int,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(IndexStreamJob.vectorSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(queryDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            batchId: Long) =>
          val session = batch.sparkSession
          IvfPqIndex.search(session, indexPath, batch, lit(true),
              k, nprobe)
            .withColumn("batch_id", lit(batchId))
            // per-WRITER dynamic mode (ADVICE r13): the DataFrameWriter
            // option overrides the session conf for this write only —
            // dynamic drops ONLY the partitions this batch touches (a
            // replay overwrites its own batch_id with identical rows),
            // and later partitioned overwrites in the same session keep
            // whatever mode the session configured.
            .write.option("partitionOverwriteMode", "dynamic")
            .mode("overwrite").partitionBy("batch_id")
            .parquet(outDir)
      }
      .start()
  }

  /** `runMain graft.streaming.SearchStreamJob <queryDir> <indexPath>
    * <outDir>` — answers everything currently in `queryDir` against
    * the index and exits.
    */
  def main(args: Array[String]): Unit = {
    val Array(queryDir, indexPath, outDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus, "search-stream")
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    val q = run(spark, queryDir, indexPath, outDir,
      s"$outDir/_stream_checkpoint", Trigger.AvailableNow(),
      k = 3, nprobe = 2)
    q.awaitTermination()
    spark.stop()
  }
}
