package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Graph}

/** Dev tool: the dedup/curation path one more decade out (VERDICT r6
  * #5) — `sbt "Test/runMain graft.CurationScaleStep [docsDir]"` drives
  * the PRODUCTION near-dup pipeline over a documents-only corpus
  * (StretchGen docs mode: every original becomes a `factor`-clique of
  * true near-duplicates):
  *
  *   exact-dedup census → shingles (df-pruned) → minhash signatures →
  *   banded LSH candidates → signature-estimate verify (est_j ≥ 0.5,
  *   the production verify; the quadratic exact-Jaccard validator is
  *   deliberately NOT in this path) → connected components → dedup
  *   survivors census.
  *
  * Per-stage wall times print for the committed BENCH_LOCAL table; the
  * question under test is whether banding + components stay near-linear
  * when the TRUE near-dup pair mass grows ~factor²/2 per original
  * (every replica pair is a genuine candidate — the work is real, so
  * the fair yardstick is pairs/sec, while stages upstream of pairing
  * must stay linear in docs).
  */
object CurationScaleStep {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/repo/target/docs-stretch-x100")
    // optional maxDf override: the default absolute cutoff (100) prunes
    // every cross-original shingle once the corpus is ~100×-replicated —
    // that IS the hot-key guard working, but to stress the banded join
    // with the FULL replica-clique pair mass the cutoff must scale with
    // the replication factor (the documented df-pruning caveat in
    // Dedup.appendMinhashIndex, measured here)
    val maxDf = args.lift(1).map(_.toLong).getOrElse(100L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "curation-scale-step")
    spark.sparkContext.setLogLevel("ERROR")
    StretchGen.ensure(spark, d): Unit
    val t00 = System.nanoTime()
    def time(n: String)(f: => Long): Long = {
      val t0 = System.nanoTime()
      val c = f
      println(f"[cprof] $n%-26s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$c")
      c
    }

    val docs = Tables.documents(spark, d)
    time("corpus.scan") { docs.count() }

    // exact dedup first, as c1 does — with perturbed replicas this must
    // collapse (nearly) nothing; it exists to show the stage is linear
    // and that the near-dup mass really reaches the banded path
    time("exact.dedup.census") {
      docs.groupBy(md5(col("text"))).agg(count(lit(1))).count()
    }

    val sh = Dedup.shingles(docs, maxDf)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    time("shingles.dfpruned") { sh.count() }

    val cand = Dedup.minhashCandidates(sh)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nCand = time("lsh.candidates") { cand.count() }

    val pairs = cand.filter(col("est_j") >= 0.5).select(col("da"), col("db"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
    val nPairs = time("estj.verify") { pairs.count() }

    val comp = Graph.connectedComponentsStar(pairs, "da", "db")
    time("components.star") { comp.count() }
    time("dedup.survivors") {
      comp.groupBy(col("component")).agg(count(lit(1))).count()
    }
    println(f"[cprof] TOTAL                      ${(System.nanoTime() - t00) / 1e9}%7.2fs cand=$nCand pairs=$nPairs")
    spark.stop()
  }
}
