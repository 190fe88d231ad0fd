package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.StreamingOps

/** Generated batch≡stream parity for the event-time operators: the
  * fixed-point parity tests in StreamingSpec become a fuzzed family —
  * random event sets, random window/slide/gap durations, and random
  * trigger chunkings (1-3 addData batches, time-ordered so nothing is
  * ever beyond the watermark horizon) must produce EXACTLY the batch
  * result of the same operator on the same rows. This is the §2.11
  * analogue of the relational/dedup differential fuzz: the claim under
  * test is that the shared operator definitions are trigger- and
  * chunking-invariant, not just correct at one hand-picked window.
  */
class StreamFuzzSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 ${10 + minute / 60}%02d:${minute % 60}%02d:00")

  private def genRows(rnd: scala.util.Random): Seq[(Timestamp, Long, String)] = {
    val n = 20 + rnd.nextInt(41)
    val types = Seq("click", "view", "error")
    (0 until n).map { _ =>
      (ts(rnd.nextInt(180)), (1 + rnd.nextInt(5)).toLong,
        types(rnd.nextInt(types.size)))
    }.sortBy(_._1.getTime)
  }

  /** Run `op` on a MemoryStream fed in `chunks` ordered batches and
    * return the complete-mode result rows as sorted strings.
    */
  private def streamed(rows: Seq[(Timestamp, Long, String)], chunks: Int,
      name: String)(op: DataFrame => DataFrame): Seq[String] = {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val q = op(mem.toDF().toDF("ts", "user_id", "event_type"))
      .writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    try {
      val size = math.max(1, (rows.size + chunks - 1) / chunks)
      rows.grouped(size).foreach { c =>
        mem.addData(c: _*)
        q.processAllAvailable()
      }
      spark.table(name).collect().map(_.toString).sorted.toSeq
    } finally q.stop()
  }

  private def parity(i: Int, rows: Seq[(Timestamp, Long, String)],
      chunks: Int, tag: String)(op: DataFrame => DataFrame): Unit = {
    val batch = op(rows.toDF("ts", "user_id", "event_type"))
      .collect().map(_.toString).sorted.toSeq
    val got = streamed(rows, chunks, s"fuzz_${tag}_$i")(op)
    assert(got == batch, s"$tag plan $i (chunks=$chunks) diverged:\n" +
      s"stream=${got.take(5)}\nbatch=${batch.take(5)}")
  }

  test("10 generated tumbling-window plans: stream ≡ batch") {
    val rnd = new scala.util.Random(31001)
    (1 to 10).foreach { i =>
      val dur = Seq("7 minutes", "13 minutes", "30 minutes",
        "45 minutes")(rnd.nextInt(4))
      parity(i, genRows(rnd), 1 + rnd.nextInt(3), "tumble")(
        StreamingOps.tumblingCounts(_, dur))
    }
  }

  test("10 generated hopping-window plans: stream ≡ batch") {
    val rnd = new scala.util.Random(31002)
    (1 to 10).foreach { i =>
      val (dur, slide) = Seq(
        ("30 minutes", "10 minutes"), ("20 minutes", "5 minutes"),
        ("45 minutes", "15 minutes"), ("14 minutes", "7 minutes"))(
        rnd.nextInt(4))
      parity(i, genRows(rnd), 1 + rnd.nextInt(3), "hop")(
        StreamingOps.hoppingCounts(_, dur, slide))
    }
  }

  test("10 generated session-window plans: stream ≡ batch") {
    val rnd = new scala.util.Random(31003)
    (1 to 10).foreach { i =>
      val gap = Seq("5 minutes", "10 minutes", "17 minutes")(rnd.nextInt(3))
      parity(i, genRows(rnd), 1 + rnd.nextInt(3), "sess")(
        StreamingOps.sessions(_, gap))
    }
  }
}
