package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic ~sf1 stretch of the driver's sf0.1 testdata (VERDICT r4 #4:
  * "run BrickProfile and CurationProfile at sf1, or a 10× synthetic
  * stretch if /root/testdata lacks sf1" — it does, so this builds one).
  *
  * Each fact/entity table is replicated `factor` times with every
  * ENTITY KEY remapped `key * factor + replica` — join integrity is
  * preserved (an order's lineitems follow it into the same replica,
  * a customer keeps its orders, a part its lineitems), entity
  * cardinality scales with the data (as the real generator does), and
  * replica 0 is the original data unchanged. Dimension tables with
  * fixed real-world cardinality (region, nation) are NOT replicated —
  * exactly like TPC-H's fixed nation/region at every sf. Text/payload
  * columns repeat across replicas; the macro profiles measure
  * shuffle/aggregate scaling, not entropy.
  *
  * Usage: `Test/runMain graft.StretchGen [factor] [outDir]`
  * (defaults: 10, /root/repo/target/sf1-stretch)
  */
object StretchGen {
  // every column that participates in a join or is an entity id
  private val keyCols = Map(
    "customer" -> Seq("c_custkey"),
    "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))
  private val passthrough = Seq("region", "nation")

  def stretch(spark: SparkSession, inDir: String, outDir: String,
      factor: Int): Unit = {
    passthrough.foreach { t =>
      spark.read.parquet(s"$inDir/$t.parquet")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
    keyCols.foreach { case (t, keys) =>
      val base = spark.read.parquet(s"$inDir/$t.parquet")
      // one explode per row instead of N unioned scans: a single pass
      // over the input producing factor× output, fully parallel
      val replicated = base
        .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      val remapped = keys.foldLeft(replicated) { (df, k) =>
        df.withColumn(k, col(k) * factor + col("__rep"))
      }
      // c_name is an IDENTITY string (the ctdbase-shaped adapter keys
      // its structure lookup on the CAS name, as the reference does):
      // leaving it duplicated across replicas creates 10×10 homonym
      // fan-outs in the brick that real growth doesn't have. Replica 0
      // keeps the original name; document TEXT is deliberately NOT
      // remapped — the duplicate burst is a harder dedup-path test.
      val renamed =
        if (t == "customer")
          remapped.withColumn("c_name",
            when(col("__rep") === 0, col("c_name"))
              .otherwise(concat(col("c_name"), lit("-r"),
                col("__rep").cast("string"))))
        else remapped
      renamed.drop("__rep")
        .write.mode("overwrite").parquet(s"$outDir/$t.parquet")
    }
  }

  /** Documents-only stretch for the dedup/curation scale step (VERDICT
    * r6 #5): replicate ONLY documents.parquet by `factor`, remapping
    * doc_id like the full stretch, but PERTURB each replica's text with
    * one appended replica-unique token (replica 0 stays the original).
    * Rationale: byte-identical replicas collapse in the exact-dedup
    * stage before LSH ever works (the round-6 finding), so a full-dup
    * stretch measures the exact-dedup path, not banding. One appended
    * token shifts the shingle set by ≤3 shingles (Jaccard within a
    * replica group stays ≳0.9) while defeating the content-hash exact
    * dedup — every replica group becomes a factor-sized clique of TRUE
    * near-duplicates that the banded path must discover and components
    * must collapse.
    */
  def stretchDocs(spark: SparkSession, inDir: String, outDir: String,
      factor: Int): Unit = {
    val base = spark.read.parquet(s"$inDir/documents.parquet")
    base
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("doc_id", col("doc_id") * factor + col("__rep"))
      .withColumn("text",
        when(col("__rep") === 0, col("text"))
          .otherwise(concat(col("text"), lit(" qz"),
            col("__rep").cast("string"))))
      .withColumn("n_chars", length(col("text")))
      .drop("__rep")
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
  }

  /** Embeddings-only stretch for the ANN recall curve (NOTES r9 #6):
    * replicate ONLY embeddings.parquet by `factor`, but PERTURB each
    * replica's vector with deterministic ε-noise (replica 0 stays the
    * original). Rationale: byte-identical replicas make nprobe=1
    * already perfect (they land in the same IVF list and quantize to
    * the same code), so a full-dup stretch can't measure
    * recall-vs-nprobe. Per-dimension noise is xxhash64(vec_id,
    * dim)-derived uniform in [-ε, ε] — seed-free deterministic like
    * every other generator here. With ε=0.05 on unit-norm 64-dim
    * vectors the noise vector's norm is ≈0.23, so replicas stay TRUE
    * near-neighbors (cos ≈ 0.97 within a group, ≈isotropic across
    * groups) that coarse assignment can now split across adjacent
    * lists — exactly the regime where nprobe matters.
    *
    * vec_id remap is BLOCKED (`vec_id + rep·N`), unlike the full
    * stretch's interleave (`vec_id·factor + rep`): IvfPqProbe pins its
    * query set as `vec_id < 10`, and under the interleave those ten
    * ids are all replicas of ONE original vector — a single
    * neighborhood. Blocked, they are ten distinct UNPERTURBED
    * originals whose true top-k are their scattered ε-replicas — ten
    * independent recall trials per probe width.
    */
  def stretchVecs(spark: SparkSession, inDir: String, outDir: String,
      factor: Int, eps: Double = 0.05): Unit = {
    val base = spark.read.parquet(s"$inDir/embeddings.parquet")
    val n = base.count()
    base
      .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
      .withColumn("vec_id", col("vec_id") + col("__rep") * n)
      .withColumn("embedding",
        when(col("__rep") === 0, col("embedding"))
          .otherwise(expr(
            // xxhash64 % 1000 keeps the dividend's sign → uniform-ish
            // integer in (-1000, 1000); /1000 → (-1, 1); ×ε bounds it
            s"transform(embedding, (x, i) -> cast(x + $eps * " +
              "((xxhash64(vec_id, i) % 1000L) / 1000.0) as float))")))
      .drop("__rep")
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  /** Regenerate a stretch fixture when absent — `target/` vanishes on
    * `sbt clean`, which used to silently strand the scale probes
    * (NOTES r8 #4). The generators are seed-free deterministic
    * functions of the sf0.1 testdata, so a regenerated fixture is
    * equivalent. Completion marker `_STRETCH_OK` guards against a
    * half-written fixture from an interrupted generation. Recognizes
    * the canonical names — `sf<k>-stretch` (factor 10·k from sf0.1)
    * and `docs-stretch-x<f>`; any other path passes through untouched
    * (the probes also accept plain testdata dirs).
    */
  def ensure(spark: SparkSession, dir: String): String = {
    val f = new java.io.File(dir)
    val marker = new java.io.File(f, "_STRETCH_OK")
    def done(): Unit = {
      java.nio.file.Files.write(marker.toPath, Array.empty[Byte]): Unit
      println(s"[stretch] regenerated $dir")
    }
    f.getName match {
      case s"sf$k-stretch" if !marker.exists() =>
        stretch(spark, "/root/testdata/sf0.1", dir, k.toInt * 10); done()
      case s"docs-stretch-x$x" if !marker.exists() =>
        stretchDocs(spark, "/root/testdata/sf0.1", dir, x.toInt); done()
      case s"vecs-stretch-x$x" if !marker.exists() =>
        stretchVecs(spark, "/root/testdata/sf0.1", dir, x.toInt); done()
      case _ => ()
    }
    dir
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("vecs")) {
      val factor = args.lift(1).map(_.toInt).getOrElse(10)
      val outDir = args.lift(2).getOrElse(
        s"/root/repo/target/vecs-stretch-x$factor")
      val spark = GraftSession.local(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-stretch")
      spark.sparkContext.setLogLevel("WARN")
      stretchVecs(spark, "/root/testdata/sf0.1", outDir, factor)
      java.nio.file.Files.write(
        new java.io.File(outDir, "_STRETCH_OK").toPath,
        Array.empty[Byte]): Unit
      println(s"STRETCH_DONE vecs $outDir x$factor")
      spark.stop()
      return
    }
    if (args.headOption.contains("docs")) {
      val factor = args.lift(1).map(_.toInt).getOrElse(100)
      val outDir = args.lift(2).getOrElse(
        s"/root/repo/target/docs-stretch-x$factor")
      val spark = GraftSession.local(
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-stretch")
      spark.sparkContext.setLogLevel("WARN")
      stretchDocs(spark, "/root/testdata/sf0.1", outDir, factor)
      java.nio.file.Files.write(
        new java.io.File(outDir, "_STRETCH_OK").toPath,
        Array.empty[Byte]): Unit
      println(s"STRETCH_DONE docs $outDir x$factor")
      spark.stop()
      return
    }
    val factor = args.headOption.map(_.toInt).getOrElse(10)
    val outDir = args.lift(1).getOrElse("/root/repo/target/sf1-stretch")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "graft-stretch")
    spark.sparkContext.setLogLevel("WARN")
    stretch(spark, "/root/testdata/sf0.1", outDir, factor)
    java.nio.file.Files.write(
      new java.io.File(outDir, "_STRETCH_OK").toPath,
      Array.empty[Byte]): Unit
    println(s"STRETCH_DONE $outDir x$factor")
    spark.stop()
  }
}
