package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph, Ops}
import graft.queries.CurationQueries

/** Dev tool: stage attribution for the full LLM-curation macro-run —
  * `sbt "Test/runMain graft.CurationProfile [sfDir] [outDir]"` times the
  * pipeline a training corpus actually goes through (scan → shingle →
  * LSH candidates → Jaccard verify → components → quality survivors →
  * split manifest → global shuffle → shard layout → curated write), so
  * macro regressions pin to a stage, and the sf0.01 → sf0.1 ratio per
  * stage exposes anything superlinear — the curation-side sibling of
  * BrickProfile.
  */
object CurationProfile {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse(
      s"/tmp/graft-curation-profile-${System.nanoTime()}")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "curation-profile")
    spark.sparkContext.setLogLevel("ERROR")
    val t00 = System.nanoTime()
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[prof] $n%-26s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$c")
    }

    val docs = Tables.documents(spark, d)
    time("corpus.scan") { docs.count() }

    // the sub-quadratic candidate path and its exact verification —
    // built fresh here (not via the query memos) so the profile times
    // the real work, not a cache hit
    val sh = Dedup.shingles(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingles.dfpruned") { sh.count() }
    time("lsh.candidates") { Dedup.minhashCandidates(sh).count() }
    val pairs = Dedup.jaccardPairs(sh).filter(col("j") >= 0.5)
      .select(col("da"), col("db"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("jaccard.verify") { pairs.count() }
    time("components") {
      Graph.connectedComponents(pairs, "da", "db").count()
    }

    // quality + dedup survivors (c1's composition, shared code path)
    val surv = CurationQueries.survivors(spark, d)
      .withColumn("split", Ops.hashSplit(concat_ws("|", col("doc_id"))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("survivors.filter") { surv.count() }
    time("split.manifest") {
      surv.groupBy(col("split"), col("lang"))
        .agg(count(lit(1)), sum(col("n_tok"))).count()
    }

    // deterministic global shuffle + fixed-size shard layout (c3 shape)
    val idx = Ops.globalRowIndex(
      surv.withColumn("hk", md5(col("doc_id").cast("string"))), "hk")
    time("global.shuffle.index") { idx.count() }
    time("shard.manifest") {
      idx.withColumn("shard", expr("pos div 100"))
        .groupBy(col("shard")).agg(count(lit(1))).count()
    }

    val t3 = System.nanoTime()
    idx.select(col("doc_id"), col("lang"), col("text"), col("split"),
        col("pos"))
      .write.mode("overwrite").partitionBy("split")
      .parquet(s"$out/curated.parquet")
    println(f"[prof] curated.write.parquet    ${(System.nanoTime() - t3) / 1e9}%6.2fs -> $out")
    println(f"[prof] TOTAL                    ${(System.nanoTime() - t00) / 1e9}%6.2fs")
    spark.stop()
  }
}
