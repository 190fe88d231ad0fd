package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** The minhash index as a cross-session parquet artifact: write once,
  * read back, get the identical candidate set — and the band layout on
  * disk supports per-band partition pruning.
  */
class DedupIndexSpec extends SparkSpec {

  test("written index reproduces the in-memory candidate set exactly") {
    val sh = Dedup.shingles(Tables.documents(spark, sf()))
    val live = Dedup.minhashCandidates(sh).select("da", "db", "est_j")

    val path = Files.createTempDirectory("graft-mhidx").toString + "/idx"
    Dedup.writeMinhashIndex(sh, path)
    val fromDisk = Dedup.minhashCandidatesFromIndex(spark, path)
      .select("da", "db", "est_j")

    assert(live.exceptAll(fromDisk).count() == 0)
    assert(fromDisk.exceptAll(live).count() == 0)
    assert(fromDisk.count() > 0, "planted near-dups should yield candidates")
  }

  test("incremental append grows the index; re-appends are collapsed on read") {
    val docs = Tables.documents(spark, sf())
    val first = docs.filter(col("doc_id") < 30)
    val rest = docs.filter(col("doc_id") >= 30)
    val path = Files.createTempDirectory("graft-mhinc").toString + "/idx"

    Dedup.writeMinhashIndex(Dedup.shingles(first), path)
    Dedup.appendMinhashIndex(Dedup.shingles(rest), path)
    val incremental = Dedup.minhashCandidatesFromIndex(spark, path)
      .select("da", "db", "est_j")
    val oneShot = Dedup.minhashCandidates(Dedup.shingles(docs))
      .select("da", "db", "est_j")
    assert(incremental.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(incremental).count() == 0)

    // appending the same slice again must not change the candidate set
    Dedup.appendMinhashIndex(Dedup.shingles(rest), path)
    val after = Dedup.minhashCandidatesFromIndex(spark, path)
      .select("da", "db", "est_j")
    assert(after.exceptAll(oneShot).count() == 0)
    assert(oneShot.exceptAll(after).count() == 0)
  }

  test("written simhash index reproduces the in-memory candidate set exactly") {
    val docs = Tables.documents(spark, sf())
    val live = Dedup.simhashCandidates(docs).select("da", "db", "hamming")
    val path = Files.createTempDirectory("graft-shidx").toString + "/idx"
    Dedup.writeSimhashIndex(docs, path)
    val fromDisk = Dedup.simhashCandidatesFromIndex(spark, path)
      .select("da", "db", "hamming")
    assert(live.exceptAll(fromDisk).count() == 0)
    assert(fromDisk.exceptAll(live).count() == 0)
    assert(fromDisk.count() > 0)
  }

  test("bands land partitioned by band on disk (per-band pruning)") {
    val sh = Dedup.shingles(Tables.documents(spark, sf()))
    val path = Files.createTempDirectory("graft-mhidx2").toString + "/idx"
    Dedup.writeMinhashIndex(sh, path)
    val bandDirs = new java.io.File(s"$path/bands").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("band="))
    assert(bandDirs.length == 8, s"expected 8 band partitions, " +
      s"got ${bandDirs.map(_.getName).mkString(",")}")
    // a single-band query prunes to one partition directory
    val one = spark.read.parquet(s"$path/bands").filter(col("band") === 3)
    val scan = one.queryExecution.executedPlan.toString
    assert(one.count() > 0)
    assert(scan.contains("PartitionFilters: [isnotnull(band"),
      s"band filter should prune partitions:\n$scan")
  }
}
