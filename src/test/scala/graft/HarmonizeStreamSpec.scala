package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.harmonize.Harmonize
import graft.sources.{EventsAdapter, StagingTriplet}

/** Streaming harmonize ingestion: staged activity rows arrive in
  * micro-batches, each batch harmonizes via `brickFromStaged` and
  * merges into the accumulated brick inside foreachBatch. Because every
  * id is a content hash, the final brick is BIT-IDENTICAL to the
  * one-shot batch build no matter how the rows were split across
  * batches — the reference's rerun-from-scratch DVC pipeline becomes a
  * continuously-ingesting one with zero reconciliation logic.
  */
class HarmonizeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("micro-batched staging merges into the batch-identical brick") {
    implicit val sq = spark.sqlContext
    val full = EventsAdapter.staging(spark, sf())
    val rows = full.activities
      .as[(String, String, String, String, String, Double)].collect()
    assert(rows.length >= 2)
    val (h1, h2) = rows.splitAt(rows.length / 2)

    var merged: Option[Harmonize.Brick] = None
    val mem = MemoryStream[(String, String, String, String, String, Double)]
    val query = mem.toDS()
      .toDF("aid", "sid", "pid", "inchi", "value", "numvalue")
      .writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            _: Long) =>
          val t = StagingTriplet(full.substances, full.properties, batch)
          val b = Harmonize.brickFromStaged(Seq("events" -> t))
          merged = Some(merged.fold(b)(m => Harmonize.merge(m, b)))
          ()
      }
      .start()
    try {
      mem.addData(h1.toSeq)
      query.processAllAvailable()
      mem.addData(h2.toSeq)
      query.processAllAvailable()
    } finally query.stop()

    val streamed = merged.get
    val oneShot = Harmonize.brick(spark, sf(), Seq(EventsAdapter))
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    }
    same(streamed.substances, oneShot.substances)
    same(streamed.properties, oneShot.properties)
    same(streamed.activities, oneShot.activities)
  }

  test("HarmonizeStreamJob drains a staging file stream into the batch brick") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-hstream").toString
    val full = EventsAdapter.staging(spark, sf())
    full.substances.write.parquet(s"$dir/staging/substances.parquet")
    full.properties.write.parquet(s"$dir/staging/properties.parquet")
    // activities arrive as two separate file drops
    val acts = full.activities.cache()
    val ids = acts.select("aid").as[String].collect().sorted
    val cut = ids(ids.length / 2)
    acts.filter(col("aid") <= cut).coalesce(1)
      .write.mode("append").parquet(s"$dir/staging/activities")
    acts.filter(col("aid") > cut).coalesce(1)
      .write.mode("append").parquet(s"$dir/staging/activities")

    val q = graft.streaming.HarmonizeStreamJob.run(spark, "events",
      s"$dir/staging", s"$dir/out",
      org.apache.spark.sql.streaming.Trigger.AvailableNow(),
      maxFilesPerTrigger = Some(1))
    q.awaitTermination()

    // highest epoch is the current brick
    val epochs = new java.io.File(s"$dir/out").listFiles()
      .map(_.getName).filter(_.startsWith("epoch="))
      .map(_.stripPrefix("epoch=").toLong).sorted
    assert(epochs.length >= 2, s"expected >=2 micro-batches, got $epochs")
    val last = s"$dir/out/epoch=${epochs.max}"
    val oneShot = Harmonize.brick(spark, sf(), Seq(EventsAdapter))
    def same(a: org.apache.spark.sql.DataFrame,
        b: org.apache.spark.sql.DataFrame): Unit = {
      assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
    }
    same(spark.read.parquet(s"$last/substances.parquet"),
      oneShot.substances)
    same(spark.read.parquet(s"$last/properties.parquet"),
      oneShot.properties)
    same(spark.read.parquet(s"$last/activities.parquet"),
      oneShot.activities)
  }
}
