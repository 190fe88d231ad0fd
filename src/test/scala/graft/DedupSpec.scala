package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Recall/behavior properties of the sub-quadratic near-dup paths against
  * the exact-Jaccard ground truth (dd2), on sf0.001 + planted fixtures.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Tables.documents(spark, sf())

  test("ground truth finds the planted near-duplicates") {
    val near = Dedup.jaccardPairs(Dedup.shingles(docs))
      .filter(col("j") >= 0.5)
    assert(near.count() >= 1, "testdata should contain planted near-dups")
  }

  test("MinHash-LSH candidates cover all high-Jaccard pairs (J >= 0.7)") {
    val truth = Dedup.jaccardPairs(Dedup.shingles(docs))
      .filter(col("j") >= 0.7).select("da", "db")
    val cand = Dedup.minhashCandidates(Dedup.shingles(docs))
      .select("da", "db")
    val missed = truth.except(cand).count()
    assert(missed == 0,
      s"$missed high-Jaccard pairs missed by LSH banding")
  }

  test("MinHash estimate tracks true Jaccard within 0.25 on candidates") {
    val truth = Dedup.jaccardPairs(Dedup.shingles(docs))
      .select(col("da"), col("db"), col("j"))
    val est = Dedup.minhashCandidates(Dedup.shingles(docs))
    val joined = est.join(truth, Seq("da", "db"))
      .withColumn("err", abs(col("est_j") - col("j")))
    val maxErr = joined.agg(max("err")).collect()(0).getDouble(0)
    assert(maxErr <= 0.25, s"max |est - true| = $maxErr")
  }

  test("SimHash: identical docs collide at hamming 0; near-dups are close") {
    val planted = Seq(
      (9001L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (9002L, "the quick brown fox jumps over the lazy dog again and again", "en"),
      (9003L, "the quick brown fox jumps over the lazy cat again and again", "en"),
      (9004L, "completely different words about spark shuffles and parquet io", "en")
    ).toDF("doc_id", "text", "lang")
    val cand = Dedup.simhashCandidates(planted)
      .select("da", "db", "hamming")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(cand((9001L, 9002L)) == 0)
    assert(cand.getOrElse((9001L, 9003L), Int.MaxValue) <= 12,
      "single-word edit should stay within small hamming distance")
  }

  test("shingle df-pruning drops hot shingles") {
    val hot = (1L to 50L).map(i => (i, "alpha beta gamma", "en")) :+
      ((99L, "alpha beta gamma delta", "en"))
    val sh = Dedup.shingles(hot.toDF("doc_id", "text", "lang"), maxDf = 10)
    // "alpha beta gamma" occurs in 51 docs -> pruned; "beta gamma delta" kept
    val kept = sh.select("sh").distinct().as[String].collect().toSet
    assert(!kept.contains("alpha beta gamma"))
    assert(kept.contains("beta gamma delta"))
  }
}
