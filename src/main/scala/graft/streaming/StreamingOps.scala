package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time operators shared by the batch and streaming paths. The
  * reference is batch-only (SURVEY §2.11); these close the streaming gap
  * a training-data engine needs. Each takes the (ts: timestamp,
  * user_id, event_type, value) shape of the events table and works
  * unchanged under `readStream` — `withWatermark` is a no-op in batch,
  * and StreamingSpec proves batch/stream parity on the same rows.
  *
  * Scale notes: windowed aggregation keys are (window, dim) — state is
  * bounded by watermark horizon × key cardinality; session windows merge
  * per user_id, hash-partitioned on the grouping key. No global windows.
  */
object StreamingOps {

  /** Tumbling event-time window counts with a 1-hour watermark. */
  def tumblingCounts(events: DataFrame, duration: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), duration).as("win"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"))

  /** Per-user session windows (gap-based) → one row per session. */
  def sessions(events: DataFrame, gap: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), gap).as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("sw.start").as("session_start"), col("user_id"),
        col("n_events"))

  /** Hopping (sliding) window counts: windowDur long, slideDur hop. */
  def hoppingCounts(events: DataFrame, windowDur: String,
      slideDur: String): DataFrame =
    events.withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), windowDur, slideDur).as("win"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("win.start").as("win_start"), col("event_type"), col("n"))

  /** Streaming exact dedup on a content key — the ingestion-side dedup of
    * a training-data pipeline (batch exact-dedup is dd1). State is
    * bounded: `dropDuplicatesWithinWatermark` evicts seen keys once the
    * watermark passes them, so memory is horizon × arrival rate, not the
    * full corpus history.
    */
  def dedupWithinWatermark(events: DataFrame, keyCols: Seq[String],
      horizon: String = "1 hour"): DataFrame =
    events.withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark(keyCols)
}
