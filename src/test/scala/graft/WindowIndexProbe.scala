package graft

import org.apache.spark.sql.functions._

/** Dev tool: the WindowIndex append-cost decade probe (VERDICT r10 #2
  * done-criterion) — `sbt "Test/runMain graft.WindowIndexProbe [sfDir]
  * [factor]"`. Builds the index at growing corpus decades, then appends
  * a FIXED-size batch to each: with the snapshot design the append does
  * O(batch) window work plus one narrow census merge, so its cost must
  * track the BATCH, not the index — the r10 design re-scanned and
  * re-aggregated every stored window row per append and grew linearly.
  * The stretch factor replicates documents with remapped doc_ids
  * (StretchGen.stretchDocs' id discipline) so decades share text mass
  * per doc.
  */
object WindowIndexProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "winidx-probe")
    spark.sparkContext.setLogLevel("ERROR")
    val base = Tables.documents(spark, d)
    val n = base.count()
    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    // fixed append batch: 500 fresh docs (ids beyond every decade)
    val batch = base.filter(col("doc_id") < 500)
      .withColumn("doc_id", col("doc_id") + lit(100L) * n)
      .persist()
    batch.count()
    for (factor <- Seq(1, 4, 16)) {
      // replicate to `factor` with blocked id remap — and PREFIX every
      // token with a replica tag so each replica contributes genuinely
      // NEW 5-grams: real corpus growth grows the distinct-hash census
      // ~linearly, and the r11-design flaw being probed (each append
      // rewrites the fully-merged census) only shows when the census
      // actually grows across decades. Shared-text replication (the
      // pre-r12 fixture) held the census CONSTANT — flat append bytes
      // there were necessary but not sufficient evidence. Token count
      // per doc is unchanged, so window mass still scales with factor.
      val corpus =
        if (factor == 1) base
        else base
          .withColumn("__rep", explode(sequence(lit(0), lit(factor - 1))))
          .withColumn("doc_id", col("doc_id") + col("__rep") * n)
          .withColumn("text",
            regexp_replace(col("text"), lit("(^| )"),
              concat(lit("$1r"), col("__rep"), lit("q"))))
          .drop("__rep")
      val dir = java.nio.file.Files
        .createTempDirectory(s"winidx-probe-$factor").toString + "/idx"
      def treeBytes(sub: String): Long = {
        val p = new org.apache.hadoop.fs.Path(s"$dir/$sub")
        val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
      }
      val (_, tw) = time(graft.operators.WindowIndex.write(corpus, dir))
      val preBytes = treeBytes("")
      val (_, ta) = time(graft.operators.WindowIndex.append(batch, dir))
      // WRITE VOLUME of the append (VERDICT r11 #1 done-criterion):
      // with the LSM census the bytes written per append must track the
      // BATCH — the r11 design rewrote the fully-merged census, so this
      // delta grew with the corpus
      val appendBytes = treeBytes("") - preBytes
      val censusBytes = treeBytes("census")
      // a second append of the SAME batch: the no-op path (manifest
      // anti-join only) — its cost is the pure O(index)-term floor
      val (_, tn) = time(graft.operators.WindowIndex.append(batch, dir))
      val nw = graft.operators.WindowIndex
        .readWindows(spark, dir).count()
      println(f"[winidx] factor=$factor%-3d docs=${n * factor}%9d windows=$nw%10d  write=$tw%7.2fs  append(500)=$ta%6.2fs  reappend-noop=$tn%6.2fs  appendMB=${appendBytes / 1048576.0}%7.2f  censusMB=${censusBytes / 1048576.0}%8.2f")
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
    spark.stop()
  }
}
