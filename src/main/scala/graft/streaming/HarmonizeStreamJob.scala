package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import graft.harmonize.Harmonize
import graft.sources.StagingTriplet

/** Continuously-ingesting harmonize — the reference's batch DVC stage
  * (src/80_harmonize.py) as a Structured Streaming job. Staging
  * activities arrive as parquet files in a watched directory; each
  * micro-batch harmonizes through `Harmonize.brickFromStaged`, merges
  * into the accumulated brick (content-addressed ids ⇒ bit-identical to
  * a one-shot batch build, HarmonizeStreamSpec), and writes the full
  * brick snapshot under `epoch=N` — the exactly-once-per-epoch layout,
  * idempotent under batch replay. The highest epoch is the current
  * brick.
  *
  * `runMain graft.streaming.HarmonizeStreamJob <name> <stagingDir> <outDir>`
  * with `<stagingDir>/substances.parquet` + `properties.parquet` static
  * and `<stagingDir>/activities/` the streamed file source; drains with
  * Trigger.AvailableNow and exits.
  */
object HarmonizeStreamJob {

  /** Staging activities schema (the SourceAdapter contract). */
  val activitiesSchema: StructType = StructType(Seq(
    StructField("aid", StringType), StructField("sid", StringType),
    StructField("pid", StringType), StructField("inchi", StringType),
    StructField("value", StringType), StructField("numvalue", DoubleType)))

  def run(spark: SparkSession, name: String, stagingDir: String,
      outDir: String, trigger: Trigger,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    val subs = spark.read.parquet(s"$stagingDir/substances.parquet")
    val props = spark.read.parquet(s"$stagingDir/properties.parquet")
    // accumulated across batches on the driver; AvailableNow-style
    // drains keep the chain short (lineage grows with batch count —
    // for an unbounded run, re-read the previous epoch instead)
    var acc: Option[Harmonize.Brick] = None
    val reader = spark.readStream.schema(activitiesSchema)
    maxFilesPerTrigger.foreach(n =>
      reader.option("maxFilesPerTrigger", n.toString))
    reader.parquet(s"$stagingDir/activities")
      .writeStream
      .trigger(trigger)
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            epoch: Long) =>
          val b = Harmonize.brickFromStaged(
            Seq(name -> StagingTriplet(subs, props, batch)))
          acc = Some(acc.fold(b)(m => Harmonize.merge(m, b)))
          val cur = acc.get
          val dir = s"$outDir/epoch=$epoch"
          cur.substances.write.mode("overwrite")
            .parquet(s"$dir/substances.parquet")
          cur.properties.write.mode("overwrite")
            .parquet(s"$dir/properties.parquet")
          cur.activities.write.mode("overwrite")
            .parquet(s"$dir/activities.parquet")
          ()
      }
      .start()
  }

  def main(args: Array[String]): Unit = {
    val Array(name, stagingDir, outDir) = args.take(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.local(cpus, "harmonize-stream")
    spark.sparkContext.setLogLevel("WARN")
    val q = run(spark, name, stagingDir, outDir, Trigger.AvailableNow())
    q.awaitTermination()
    spark.stop()
  }
}
