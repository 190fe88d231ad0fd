package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` payloads with
  * typed metadata, decoded via a partition-streaming typed pipeline.
  *
  * The decode step is a STUB: real deployments plug an image/audio codec
  * in `FakeCodec` (none is available in this container — brief's
  * instruction). Everything around it — the binary column schema, the
  * `Dataset[MediaRecord]` encoder, the `mapPartitions` batch shape with
  * one decoder instance per partition, and the feature schema — is the
  * real, tested engine surface.
  *
  * Scale notes: payloads stay as single binary cells (no row explosion);
  * decode is embarrassingly parallel per partition with no shuffle; a
  * real codec's expensive init happens once per partition inside
  * `mapPartitions`, not per row — the exact reason this is not a UDF.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte],
      meta: String)

  case class MediaFeatures(doc_id: Long, kind: String, n_bytes: Long,
      width: Int, height: Int, fingerprint: String)

  /** documents → media records: payload = utf8 bytes standing in for
    * image/audio/video bytes; kind assigned deterministically.
    */
  def toMedia(docs: DataFrame)(implicit spark: SparkSession)
      : Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(col("doc_id"),
        when(pmod(col("doc_id"), lit(3)) === 0, "image")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"),
        col("text").cast("binary").as("payload"),
        to_json(struct(col("source"), col("lang"))).as("meta"))
      .as[MediaRecord]
  }

  /** STUB codec — deterministic fake decode. A real implementation
    * replaces `decode` with e.g. a JNI image decoder; the call shape
    * (bytes in, dims + fingerprint out) is what the pipeline contracts
    * on.
    */
  private[multimodal] object FakeCodec {
    def decode(payload: Array[Byte]): (Int, Int, String) = {
      val n = payload.length
      val width = 64 + (n % 512)
      val height = 64 + ((n * 7) % 512)
      val md = java.security.MessageDigest.getInstance("MD5")
      val fp = md.digest(payload).map("%02x".format(_)).mkString
      (width, height, fp)
    }
  }

  /** Decode/feature-extract with one codec per partition, streaming
    * batches of records through it (the Scala analog of a mapInPandas
    * batch UDF).
    */
  def decodeFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here (expensive in real codecs)
      val codec = FakeCodec
      it.map { r =>
        val (w, h, fp) = codec.decode(r.payload)
        MediaFeatures(r.doc_id, r.kind, r.payload.length.toLong, w, h, fp)
      }
    }
  }

  case class FrameRef(doc_id: Long, frame_idx: Int, ts_ms: Long,
      fingerprint: String)

  /** Frame sampling over video payloads — the 1→N multimodal shape
    * (flatMap generator, controlled fan-out: the stub emits
    * 1 + n_bytes % 4 frames; a real codec emits one per keyframe or
    * fixed stride). Frame fingerprints are md5(payload_utf8 + "|" + idx)
    * so the DuckDB oracle replays the arithmetic end to end (mm3).
    */
  def frameSample(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[FrameRef] = {
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val text = new String(r.payload, java.nio.charset.StandardCharsets.UTF_8)
      val nFrames = 1 + (r.payload.length % 4)
      (0 until nFrames).map { i =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val fp = md.digest((text + "|" + i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          .map("%02x".format(_)).mkString
        FrameRef(r.doc_id, i, i * 40L, fp)
      }
    }
  }

  /** Integer aspect-preserving resize of decoded dims: the largest side
    * is clamped to maxDim, the other floor-scaled by the same ratio.
    * Pure metadata arithmetic (the stub never touches pixels); a real
    * implementation resizes inside the per-partition codec instead.
    */
  def resize(features: Dataset[MediaFeatures], maxDim: Int)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    features.map { f =>
      val m = math.max(f.width, f.height)
      if (m <= maxDim) f
      else f.copy(width = f.width * maxDim / m,
        height = f.height * maxDim / m)
    }
  }
}
