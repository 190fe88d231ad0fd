package graft

import org.apache.spark.sql.functions._
import graft.multimodal.Multimodal
import graft.operators.Dedup

/** The multimodal perceptual-hash path (mm4/mm5): the stub codec's
  * phash locality properties, the generic banded-hamming candidate
  * engine being exactly the brute-force hamming filter (recall AND
  * precision on candidates it generates), and the cross-frame probe
  * agreeing with the self-join restricted across the split.
  */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  private def ph(s: String): Long = {
    // the codec seam, driven exactly as perceptualHashes drives it
    val media = Multimodal.toMedia(
      Seq((1L, s, "en", "t")).toDF("doc_id", "text", "lang", "source"))(spark)
    Multimodal.perceptualHashes(media)(spark).head().phash
  }

  private def hamming(a: Long, b: Long): Int =
    java.lang.Long.bitCount(a ^ b)

  test("phash: re-encode invariance and edit locality") {
    val base = "The quick Brown fox jumps over the lazy dog and then " +
      "runs far away across the wide open field toward the river"
    // normalization = the stub's decode-invariance: case and whitespace
    // changes (a "re-encode") hash IDENTICALLY
    assert(ph(base) == ph(base.toUpperCase))
    assert(ph(base) == ph(base.replace(" ", "   ")))
    // a small edit moves only a few bits (the grams covering it)…
    val edited = base.replace("lazy", "hazy")
    assert(hamming(ph(base), ph(edited)) <= 6,
      s"edit moved ${hamming(ph(base), ph(edited))} bits")
    // …while unrelated content is far away in hamming space
    val other = "completely different words about spacecraft telemetry " +
      "and orbital mechanics with no shared phrasing whatsoever here"
    assert(hamming(ph(base), ph(other)) > 6,
      s"unrelated docs only ${hamming(ph(base), ph(other))} bits apart")
  }

  test("banded candidates = brute-force hamming filter within guarantee") {
    // 40 docs: 10 base texts × 4 variants (exact, case, one-edit,
    // unrelated suffix), real corpus-ish sizes
    val texts = (0 until 10).flatMap { i =>
      val base = s"document number $i talks about topic $i in many " +
        s"words repeated enough to form plenty of byte grams for doc $i"
      Seq(
        (i * 4L, base),
        (i * 4L + 1, base.toUpperCase),
        (i * 4L + 2, base.replace("plenty", "loads")),
        (i * 4L + 3, s"totally unrelated content item $i about nothing " +
          s"shared with the base text whatsoever just noise $i noise"))
    }.toDF("doc_id", "text")
    val media = Multimodal.toMedia(texts
      .withColumn("lang", lit("en")).withColumn("source", lit("s")))(spark)
    val sigs = Multimodal.perceptualHashes(media)(spark).toDF()
      .select(col("doc_id"), col("phash"))
    val banded = Dedup.bandedHammingCandidates(sigs, "phash")
      .filter(col("hamming") <= 3)
      .select("da", "db").collect().map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    // brute-force ground truth at hamming ≤ 3 — INSIDE the 4-block
    // pigeonhole guarantee, so banding must find every pair exactly
    val all = sigs.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- all; (ib, hb) <- all
      if ia < ib && java.lang.Long.bitCount(ha ^ hb) <= 3
    } yield (ia, ib)).toSet
    assert(banded == brute)
    assert(brute.nonEmpty, "fixture produced no near pairs")
    // exact + case variants must be found; the unrelated variant must
    // never pair with ITS OWN base family (unrelated docs DO pair with
    // each other across i — they share a template up to one digit,
    // which is exactly the near-dup the hash exists to catch)
    assert(brute.contains((0L, 1L)))
    assert(!brute.exists { case (a, b) =>
      a / 4 == b / 4 && (a % 4 == 3 || b % 4 == 3) })
  }

  test("cross-frame probe = self-join restricted across the split") {
    val texts = (0 until 12).flatMap { i =>
      val base = s"shared base text number $i with enough repeated words " +
        s"to build a stable byte gram profile for item $i of the corpus"
      Seq((i * 2L, base), (i * 2L + 1, base.replace("stable", "steady")))
    }.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
    val sigs = Multimodal.perceptualHashes(
      Multimodal.toMedia(texts)(spark))(spark).toDF()
      .select(col("doc_id"), col("phash"))
    val isProbe = col("doc_id") % 2 === 1
    val probe = Dedup.bandedHammingProbe(
        sigs.filter(!isProbe), sigs.filter(isProbe), "phash")
      .filter(col("hamming") <= 6)
      .select(least(col("da"), col("db")).as("da"),
        greatest(col("da"), col("db")).as("db"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val self = Dedup.bandedHammingCandidates(sigs, "phash")
      .filter(col("hamming") <= 6)
      .filter((col("da") % 2 === 1) =!= (col("db") % 2 === 1))
      .select("da", "db")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(probe == self)
    assert(probe.nonEmpty)
  }
}
