package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal binary-column pipeline over `documents` (payload = utf8
  * bytes standing in for media bytes; see Multimodal scaladoc — decode is
  * a deterministic stub, the plumbing is real and oracle-checked).
  */
object MultimodalQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Binary column plumbing: cast→binary, byte lengths, binary hashing.
    "mm1_binary_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("payload", col("text").cast("binary"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("payload"))).as("sum_bytes"),
          countDistinct(md5(col("payload"))).as("n_fingerprints"))
        .orderBy(col("source"))
    }),

    // Typed Dataset[MediaRecord] → mapPartitions decode →
    // Dataset[MediaFeatures], aggregated per media kind.
    "mm2_decoded_features" -> ((s, d) => {
      implicit val spark = s
      val media = Multimodal.toMedia(Tables.documents(s, d))
      Multimodal.decodeFeatures(media).toDF()
        .groupBy(col("kind"))
        .agg(count(lit(1)).as("n"),
          sum(col("n_bytes")).as("sum_bytes"),
          sum(col("width")).as("sum_width"),
          sum(col("height")).as("sum_height"),
          countDistinct(col("fingerprint")).as("n_fp"))
        .orderBy(col("kind"))
    }),

    // Frame sampling (1→N flatMap over video payloads) — census of the
    // sampled frames; the oracle replays the stub's fan-out arithmetic.
    "mm3_frame_sample" -> ((s, d) => {
      implicit val spark = s
      val media = Multimodal.toMedia(Tables.documents(s, d))
      Multimodal.frameSample(media).toDF()
        .agg(countDistinct(col("doc_id")).as("n_videos"),
          count(lit(1)).as("n_frames"),
          countDistinct(col("fingerprint")).as("n_fp"),
          sum(col("ts_ms")).as("sum_ts_ms"))
    })
  )

  val oracle: Map[String, String] = Map(
    "mm1_binary_stats" ->
      """SELECT source, count(*) AS n_docs,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
        |  count(DISTINCT md5(text)) AS n_fingerprints
        |FROM documents GROUP BY 1 ORDER BY source""".stripMargin,

    // Replays the stub codec's arithmetic (dims from byte length,
    // fingerprint = md5 of the bytes).
    "mm2_decoded_features" ->
      """SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
        |            WHEN doc_id % 3 = 1 THEN 'audio'
        |            ELSE 'video' END AS kind,
        |  count(*) AS n,
        |  CAST(sum(octet_length(encode(text))) AS BIGINT) AS sum_bytes,
        |  CAST(sum(64 + octet_length(encode(text)) % 512) AS BIGINT) AS sum_width,
        |  CAST(sum(64 + (octet_length(encode(text)) * 7) % 512) AS BIGINT) AS sum_height,
        |  count(DISTINCT md5(text)) AS n_fp
        |FROM documents GROUP BY 1 ORDER BY kind""".stripMargin,

    "mm3_frame_sample" ->
      """WITH v AS (
        |  SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
        |  FROM documents WHERE doc_id % 3 = 2),
        |f AS (
        |  SELECT doc_id, g * 40 AS ts_ms,
        |    md5(text || '|' || CAST(g AS VARCHAR)) AS fp
        |  FROM v CROSS JOIN unnest(range(0, 1 + n_bytes % 4)) AS u(g))
        |SELECT count(DISTINCT doc_id) AS n_videos, count(*) AS n_frames,
        |  count(DISTINCT fp) AS n_fp,
        |  CAST(sum(ts_ms) AS BIGINT) AS sum_ts_ms
        |FROM f""".stripMargin
  )
}
