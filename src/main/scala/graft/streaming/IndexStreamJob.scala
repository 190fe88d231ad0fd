package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.operators.IvfPqIndex

/** Streaming maintenance of a persisted IVF-PQ index — the batch
  * `IvfPqIndex.append` (frozen quantizers) driven by Structured
  * Streaming: new vectors arrive as parquet files in a watched
  * directory and each micro-batch appends them to the on-disk
  * artifact via `foreachBatch`.
  *
  * Exactly-once BY IDEMPOTENCE, not by sink transactions:
  * `foreachBatch` gives at-least-once delivery (a batch replayed
  * after a failure re-runs the whole closure), and `append`'s per-leg
  * anti-joins make a re-appended batch a no-op — the same contract
  * that lets the batch retry path re-run safely makes the streaming
  * path safe under replay, with NO read-side dedup on the search hot
  * path. `IndexStreamSpec` pins both identities: stream-appended ≡
  * batch-appended (lists, codes, and the nprobe search result), and
  * a full replay of every file (fresh checkpoint, same index)
  * changes nothing.
  *
  * Scale shape per micro-batch: one scan of the new files, broadcast
  * coarse/codebook assignment, append-only writes — the artifact's
  * existing rows are never read (beyond the anti-join's vec_id
  * column) or rewritten, so maintenance cost tracks the ARRIVAL rate,
  * not the index size. Retraining (quantizer drift) stays a batch
  * decision: stop the stream, fresh `write`, restart.
  */
object IndexStreamJob {

  /** The embeddings-table schema (TESTDATA.md): file streams need an
    * explicit schema — there is no inference on a watched directory.
    */
  val vectorSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def run(spark: SparkSession, vecDir: String, indexPath: String,
      checkpointDir: String, trigger: Trigger,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val reader = spark.readStream.schema(vectorSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(vecDir)
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", checkpointDir)
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          IvfPqIndex.append(batch, indexPath)
      }
      .start()
  }

  /** `runMain graft.streaming.IndexStreamJob <vecDir> <indexPath>` —
    * drains everything currently in `vecDir` into the index at
    * `indexPath` (which must already exist via `IvfPqIndex.write`)
    * and exits.
    */
  def main(args: Array[String]): Unit = {
    val Array(vecDir, indexPath) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus, "index-stream")
    spark.sparkContext.setLogLevel("WARN")
    val q = run(spark, vecDir, indexPath,
      s"$indexPath/_stream_checkpoint", Trigger.AvailableNow())
    q.awaitTermination()
    spark.stop()
  }
}
