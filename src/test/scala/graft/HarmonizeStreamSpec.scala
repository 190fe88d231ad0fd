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
}
