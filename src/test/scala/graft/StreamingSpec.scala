package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.streaming.StreamingOps

/** True stream-mode behavior of the event-time operators: batch/stream
  * parity, watermark late-data handling, and custom state with
  * mapGroupsWithState.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  private val rows = Seq(
    (ts(0), 1L, "click"), (ts(10), 1L, "click"), (ts(59), 2L, "view"),
    (ts(5), 2L, "click"), (ts(45), 1L, "view"))

  test("tumblingCounts: streaming (complete mode) matches batch on same rows") {
    val batchDf = rows.toDF("ts", "user_id", "event_type")
    val expected = StreamingOps.tumblingCounts(batchDf, "30 minutes")
      .collect().map(_.toString).sorted

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val streamed = StreamingOps.tumblingCounts(
      mem.toDF().toDF("ts", "user_id", "event_type"), "30 minutes")
    val query = streamed.writeStream.format("memory")
      .queryName("tumbling_parity").outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("tumbling_parity")
        .collect().map(_.toString).sorted
      assert(got.toSeq == expected.toSeq)
    } finally query.stop()
  }

  test("watermark drops events later than the horizon in append mode") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val agg = mem.toDF().toDF("ts", "user_id", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val query = agg.writeStream.format("memory")
      .queryName("late_data").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), 1L, "click"), (ts(10), 1L, "click"))
      query.processAllAvailable()
      // advance watermark far past the first window
      mem.addData((Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "click"))
      query.processAllAvailable()
      // this event is hours behind the watermark -> dropped
      mem.addData((ts(1), 1L, "late"))
      query.processAllAvailable()
      val emitted = spark.table("late_data")
      assert(emitted.filter(col("event_type") === "late").count() == 0)
      // the on-time window was finalized with both clicks
      val clicks = emitted.filter(col("event_type") === "click")
        .agg(sum("n")).collect()(0).getLong(0)
      assert(clicks == 2L)
    } finally query.stop()
  }

  test("mapGroupsWithState maintains running per-user counts across triggers") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val counted = mem.toDF().toDF("ts", "user_id", "event_type")
      .as[(Timestamp, Long, String)]
      .groupByKey(_._2)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, it: Iterator[(Timestamp, Long, String)],
         state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + it.size
          state.update(total)
          (user, total)
      }.toDF("user_id", "total")
    val query = counted.writeStream.format("memory")
      .queryName("running_counts").outputMode(OutputMode.Update()).start()
    try {
      mem.addData((ts(0), 1L, "a"), (ts(1), 1L, "b"), (ts(2), 2L, "c"))
      query.processAllAvailable()
      mem.addData((ts(3), 1L, "d"))
      query.processAllAvailable()
      val last = spark.table("running_counts")
        .groupBy("user_id").agg(max("total").as("total"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(last == Map(1L -> 3L, 2L -> 1L))
    } finally query.stop()
  }

  test("sessions split on the inactivity gap") {
    val df = Seq(
      (ts(0), 1L, "a"), (ts(5), 1L, "a"),     // session 1
      (ts(50), 1L, "a"),                      // session 2 (45-min gap)
      (ts(0), 2L, "a")                        // user 2, one session
    ).toDF("ts", "user_id", "event_type")
    val out = StreamingOps.sessions(df, "30 minutes")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 2L, 2L -> 1L))
  }

  test("file-source readStream over parquet matches the batch result") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batchDf = rows.toDF("ts", "user_id", "event_type")
    batchDf.write.mode("overwrite").parquet(s"$dir/in")
    val expected = StreamingOps.tumblingCounts(batchDf, "30 minutes")
      .collect().map(_.toString).sorted

    val streamed = StreamingOps.tumblingCounts(
      spark.readStream.schema(batchDf.schema).parquet(s"$dir/in"),
      "30 minutes")
    val query = streamed.writeStream.format("memory")
      .queryName("file_stream")
      .outputMode(OutputMode.Complete())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    try {
      query.processAllAvailable()
      val got = spark.table("file_stream").collect().map(_.toString).sorted
      assert(got.toSeq == expected.toSeq)
    } finally query.stop()
  }

  test("stream-static dimension join enriches events in flight") {
    implicit val sq = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val joined = mem.toDF().toDF("ts", "user_id", "event_type")
      .join(dim, Seq("user_id"))
      .groupBy("tier").count()
    val query = joined.writeStream.format("memory")
      .queryName("stream_static").outputMode(OutputMode.Complete()).start()
    try {
      mem.addData((ts(0), 1L, "a"), (ts(1), 1L, "b"), (ts(2), 2L, "c"),
        (ts(3), 9L, "d")) // user 9 has no dim row -> dropped (inner)
      query.processAllAvailable()
      val got = spark.table("stream_static").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == Map("gold" -> 2L, "silver" -> 1L))
    } finally query.stop()
  }

  test("stream-stream interval join pairs events within the time bound") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "1 hour")
    val p = purchases.toDF().toDF("p_ts", "p_user").withWatermark("p_ts", "1 hour")
    // purchase attributed to a click by the same user within 30 minutes
    val joined = c.join(p,
      expr("c_user = p_user AND p_ts >= c_ts AND " +
        "p_ts <= c_ts + interval 30 minutes"))
    val query = joined.writeStream.format("memory")
      .queryName("stream_stream").outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((ts(0), 1L), (ts(0), 2L))
      purchases.addData((ts(10), 1L),  // within 30 min of user 1's click
        (Timestamp.valueOf("2024-01-01 11:30:00"), 2L)) // outside bound
      query.processAllAvailable()
      val got = spark.table("stream_stream")
        .select("c_user").collect().map(_.getLong(0)).toSeq
      assert(got == Seq(1L), s"expected only user 1 attributed, got $got")
    } finally query.stop()
  }

  test("stream-stream LEFT-outer interval join emits unmatched rows as nulls") {
    implicit val sq = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val purchases = MemoryStream[(Timestamp, Long)]
    val c = clicks.toDF().toDF("c_ts", "c_user").withWatermark("c_ts", "10 minutes")
    val p = purchases.toDF().toDF("p_ts", "p_user").withWatermark("p_ts", "10 minutes")
    // purchase keeps its row with a NULL click once the watermark passes
    // the join bound — the st6 batch face's organic remainder, live
    val joined = p.join(c,
      expr("p_user = c_user AND c_ts >= p_ts - interval 30 minutes AND " +
        "c_ts <= p_ts"), "leftOuter")
    val query = joined.writeStream.format("memory")
      .queryName("stream_outer").outputMode(OutputMode.Append()).start()
    try {
      clicks.addData((ts(0), 1L))
      purchases.addData((ts(10), 1L), (ts(10), 9L)) // 9: no click anywhere
      query.processAllAvailable()
      // advance both watermarks far past the bound so user 9's row expires
      clicks.addData((Timestamp.valueOf("2024-01-01 14:00:00"), 99L))
      purchases.addData((Timestamp.valueOf("2024-01-01 14:00:00"), 98L))
      query.processAllAvailable()
      val rows = spark.table("stream_outer")
        .filter(col("p_ts") < "2024-01-01 12:00:00")
        .select(col("p_user"), col("c_user")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .toSet
      assert(rows == Set((1L, 1L), (9L, -1L)),
        s"expected matched user 1 + null-padded user 9, got $rows")
    } finally query.stop()
  }

  test("dropDuplicatesWithinWatermark dedups repeated keys across triggers") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val deduped = StreamingOps.dedupWithinWatermark(
      mem.toDF().toDF("ts", "user_id", "content_key"), Seq("content_key"))
    val query = deduped.writeStream.format("memory")
      .queryName("stream_dedup").outputMode(OutputMode.Append()).start()
    try {
      mem.addData((ts(0), 1L, "a"), (ts(1), 2L, "a"), (ts(2), 3L, "b"))
      query.processAllAvailable()
      // same keys again in a later trigger, still inside the watermark
      mem.addData((ts(3), 4L, "a"), (ts(4), 5L, "b"), (ts(5), 6L, "c"))
      query.processAllAvailable()
      val got = spark.table("stream_dedup")
        .select("content_key").collect().map(_.getString(0)).sorted.toSeq
      assert(got == Seq("a", "b", "c"), s"got $got")
    } finally query.stop()
  }

  test("stateless chunking transform applies unchanged to a stream (batch parity)") {
    // x13's chunk explode is a pure per-row generator, so the SAME
    // column expressions run in a streaming query with no watermark,
    // no state, and append mode — the property that makes doc→chunk
    // prep safe to run on an ingest stream at any rate.
    val batch = graft.queries.TextQueries.chunked(
      Tables.documents(spark, sf()))
      .select(col("doc_id"), col("st"), col("ck_fp"))
    val expected = batch.collect().map(_.toString).sorted

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Long, String, String)]
    val streamed = graft.queries.TextQueries.chunked(
      mem.toDF().toDF("doc_id", "text", "lang"))
      .select(col("doc_id"), col("st"), col("ck_fp"))
    val query = streamed.writeStream.format("memory")
      .queryName("chunk_parity").outputMode(OutputMode.Append()).start()
    try {
      val rows = Tables.documents(spark, sf())
        .select(col("doc_id"), col("text"), col("lang")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      // feed in two triggers to prove per-batch statelessness
      val (first, second) = rows.splitAt(rows.length / 2)
      mem.addData(first.toIndexedSeq: _*)
      query.processAllAvailable()
      mem.addData(second.toIndexedSeq: _*)
      query.processAllAvailable()
      val got = spark.table("chunk_parity").collect().map(_.toString).sorted
      assert(got.toSeq == expected.toSeq)
    } finally query.stop()
  }

  test("CMS sketch aggregated over a stream equals the batch sketch") {
    // the Count-Min Aggregator's merge is associative+commutative, so
    // complete-mode streaming aggregation over any trigger split must
    // produce the identical counter grid to one batch pass
    val toks = Seq("a", "b", "a", "c", "a", "b", "d", "e", "a", "c")
    val batchSketch = toks.toDF("token")
      .agg(graft.functions.CountMin.cmsSketch(4, 64)(col("token")).as("cms"))
      .head.getSeq[Long](0).toVector

    implicit val sq = spark.sqlContext
    val mem = MemoryStream[String]
    val agg = mem.toDF().toDF("token")
      .agg(graft.functions.CountMin.cmsSketch(4, 64)(col("token")).as("cms"))
    val query = agg.writeStream.format("memory")
      .queryName("cms_parity").outputMode(OutputMode.Complete()).start()
    try {
      val (first, second) = toks.splitAt(4)
      mem.addData(first: _*)
      query.processAllAvailable()
      mem.addData(second: _*)
      query.processAllAvailable()
      val got = spark.table("cms_parity").head.getSeq[Long](0).toVector
      assert(got == batchSketch)
    } finally query.stop()
  }

  test("foreachBatch sink writes exactly-once-per-batch parquet epochs") {
    implicit val sq = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-feb").toString
    val mem = MemoryStream[(Timestamp, Long, String)]
    val query = mem.toDF().toDF("ts", "user_id", "event_type")
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], epoch: Long) =>
        batch.write.mode("overwrite").parquet(s"$dir/epoch=$epoch")
        ()
      }
      .start()
    try {
      mem.addData((ts(0), 1L, "click"))
      query.processAllAvailable()
      mem.addData((ts(1), 2L, "view"), (ts(2), 3L, "click"))
      query.processAllAvailable()
      val all = spark.read
        .option("basePath", dir)
        .parquet(s"$dir/epoch=*")
      assert(all.count() == 3)
      assert(all.select("epoch").distinct().count() == 2)
    } finally query.stop()
  }

  test("Trigger.AvailableNow drains a file source then stops on its own") {
    val dir = java.nio.file.Files.createTempDirectory("graft-avnow").toString
    val batchDf = rows.toDF("ts", "user_id", "event_type")
    batchDf.write.mode("overwrite").parquet(s"$dir/in")
    val query = spark.readStream.schema(batchDf.schema).parquet(s"$dir/in")
      .writeStream.format("memory").queryName("avail_now")
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .option("checkpointLocation", s"$dir/ckpt")
      .start()
    query.awaitTermination(60000)
    assert(!query.isActive, "AvailableNow query should self-terminate")
    assert(spark.table("avail_now").count() == rows.size)
  }
}
