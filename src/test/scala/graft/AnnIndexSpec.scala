package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.ScalarQuantIndex

/** The persisted scalar-quantization index: write/read identity, the
  * per-dim quantization error bound, and artifact-only search parity.
  */
class AnnIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf())

  test("index round-trips: decoded vectors identical from memory and disk") {
    val dir = Files.createTempDirectory("graft-sqidx").toString + "/idx"
    ScalarQuantIndex.write(emb, dir)
    val (stats, codes) = ScalarQuantIndex.build(emb)
    val mem = ScalarQuantIndex.reconstruct(codes, stats)
    val disk = ScalarQuantIndex.reconstructFromIndex(spark, dir)
    // codes are ints and stats round-trip exactly through parquet, so
    // the decode arithmetic is identical — exact frame equality
    assert(mem.exceptAll(disk).count() == 0)
    assert(disk.exceptAll(mem).count() == 0)
    assert(disk.count() == emb.count())
  }

  test("midpoint decode stays within half a bucket of the true value") {
    val (stats, codes) = ScalarQuantIndex.build(emb)
    val truth = ScalarQuantIndex.normalizedScalar(emb)
    val decoded = ScalarQuantIndex.reconstruct(codes, stats)
      .select(col("vec_id"), posexplode(col("rv")).as(Seq("pos", "rval")))
    val bound = decoded.join(truth, Seq("vec_id", "pos"))
      .join(stats, Seq("pos"))
      // half a bucket (mx-mn)/512, plus float slack
      .filter(abs(col("rval") - col("nvv")) >
        (col("mx") - col("mn")) / 512 + 1e-12)
    assert(bound.count() == 0)
  }

  test("artifact-only search matches the in-memory quantized search") {
    val dir = Files.createTempDirectory("graft-sqidx2").toString + "/idx"
    ScalarQuantIndex.write(emb, dir)
    val (stats, codes) = ScalarQuantIndex.build(emb)
    val fromMem = ScalarQuantIndex.search(
      ScalarQuantIndex.reconstruct(codes, stats), col("vec_id") < 10, 3)
    val fromDisk = ScalarQuantIndex.search(
      ScalarQuantIndex.reconstructFromIndex(spark, dir),
      col("vec_id") < 10, 3)
    assert(fromMem.collect().toSet == fromDisk.collect().toSet)
    assert(fromDisk.count() == 30) // 10 queries × top-3
  }

  test("PQ artifact: 4-byte codes, valid codebook ids, deterministic rebuild") {
    import graft.operators.ProductQuantIndex
    val dir = Files.createTempDirectory("graft-pqidx").toString + "/idx"
    ProductQuantIndex.write(emb, dir)
    val codes = spark.read.parquet(s"$dir/codes")
    val books = spark.read.parquet(s"$dir/codebooks")
    assert(codes.count() == emb.count())
    // every vector encodes as exactly 4 sub-codes, each a real centroid
    assert(codes.filter(size(col("code")) =!= 4).count() == 0)
    val badIds = codes
      .select(posexplode(col("code")).as(Seq("b", "cid")))
      .join(books.select(col("b"), col("cid").cast("int").as("cid")),
        Seq("b", "cid"), "left_anti")
    assert(badIds.count() == 0, "code referencing a missing centroid")
    // rebuild determinism: training again yields the identical artifact
    // (both directions + counts, so dropped rows can't slip through)
    val (books2, codes2) = ProductQuantIndex.build(emb)
    val codes1 = codes.select(col("vec_id"), col("code"))
    assert(codes2.exceptAll(codes1).count() == 0)
    assert(codes1.exceptAll(codes2).count() == 0)
    assert(books2.exceptAll(books).count() == 0)
    assert(books.exceptAll(books2).count() == 0)
    assert(books2.count() == books.count())
  }

  test("PQ ADC search runs entirely off the artifact, deterministically") {
    import graft.operators.ProductQuantIndex
    val dir = Files.createTempDirectory("graft-pqidx2").toString + "/idx"
    ProductQuantIndex.write(emb, dir)
    val a = ProductQuantIndex.search(spark, dir, emb, col("vec_id") < 10, 3)
    val b = ProductQuantIndex.search(spark, dir, emb, col("vec_id") < 10, 3)
    assert(a.count() == 30)
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("candidate-restricted ADC over all pairs equals the full search") {
    // searchCandidates (the IVF-PQ tail, ann11) must be ARITHMETICALLY
    // identical to searchFrames — same sequential-fold slice dots, same
    // fixed-order adc sum, same tiebreaks. Feeding it the complete
    // query×corpus candidate set makes the two paths comparable
    // end-to-end: any drift in the slice extraction, codebook join, or
    // ranking shows up as a row diff here.
    import graft.operators.ProductQuantIndex
    val (books, codes) = ProductQuantIndex.build(emb)
    val allPairs = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"))
      .crossJoin(emb.select(col("vec_id").as("neighbor_id")))
      .filter(col("query_id") =!= col("neighbor_id"))
    val viaCands = ProductQuantIndex.searchCandidates(
      books, codes, emb, col("vec_id") < 10, allPairs, 3)
    val full = ProductQuantIndex.searchFrames(
      books, codes, emb, col("vec_id") < 10, 3)
    assert(viaCands.exceptAll(full).count() == 0)
    assert(full.exceptAll(viaCands).count() == 0)
    assert(viaCands.count() == 30)
  }
  test("recall-audit query bound is enforced lazily, inside the plan") {
    // ADVICE r9: the old eager limit().count() guard ran a Spark job at
    // query CONSTRUCTION (timed into every bench pass). Now the bound
    // rides the plan: construction is free, and an unbounded audit
    // fails at EXECUTION with the contract message.
    graft.functions.GraftFunctions.register(spark)
    val big = spark.range(0, 1200).toDF("vec_id")
      .withColumn("embedding", array(
        (col("vec_id") % 7 + 1).cast("float"),
        (col("vec_id") % 5 + 1).cast("float")))
    // construction must NOT throw and must not need a job
    val audited = graft.queries.SimilarityQueries
      .exactTop3Audit(big, col("vec_id") >= 0)
    val ex = intercept[Exception] { audited.count() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("recall audit")), msgs(ex).mkString("|"))
    // a bounded audit still returns exact top-3 per query
    val small = graft.queries.SimilarityQueries
      .exactTop3Audit(big, col("vec_id") < 4)
    val got = small.groupBy(col("query_id")).count().collect()
    assert(got.length == 4 && got.forall(_.getLong(1) == 3))
  }
}
