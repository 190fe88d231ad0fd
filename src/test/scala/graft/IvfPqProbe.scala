package graft

import org.apache.spark.sql.functions._

/** Dev tool: time the persisted IVF-PQ index lifecycle at an arbitrary
  * data dir — `sbt "Test/runMain graft.IvfPqProbe <sfDir>"`. Measures
  * write (train+assign+encode the first half), append (frozen-quantizer
  * assign+encode of the second half), and warm 2-probe search off the
  * artifact. Complements the ann11 QueryProbe row: that times the
  * memoized in-session composite; this times the on-disk artifact path
  * a production pipeline would run.
  */
object IvfPqProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "ivfpq-probe")
    spark.sparkContext.setLogLevel("ERROR")
    StretchGen.ensure(spark, d): Unit
    graft.functions.GraftFunctions.register(spark)
    val dir = java.nio.file.Files
      .createTempDirectory("ivfpq-probe").toString + "/idx"
    val emb = Tables.embeddings(spark, d)
    val n = emb.count()
    val k = math.ceil(math.sqrt(10.0 * n)).toInt
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ivfpq] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
      r
    }
    val a = emb.filter(col("vec_id") < n / 2)
    val b = emb.filter(col("vec_id") >= n / 2)
    println(s"[ivfpq] n=$n k=$k dir=$d")
    time("write (train half)") {
      graft.operators.IvfPqIndex.write(a, dir, k)
    }
    time("append (frozen, half)") {
      graft.operators.IvfPqIndex.append(b, dir)
    }
    time("search cold (nprobe=2)") {
      graft.operators.IvfPqIndex
        .search(spark, dir, emb, col("vec_id") < 10, 3, 2).count()
    }
    (1 to 2).foreach { i =>
      time(s"search warm $i (nprobe=2)") {
        graft.operators.IvfPqIndex
          .search(spark, dir, emb, col("vec_id") < 10, 3, 2).count()
      }
    }

    // The nprobe recall-vs-cost curve off the persisted artifact
    // (VERDICT r8 #3): exact cosine top-3 for the 10 pinned queries as
    // ground truth (Q=10 — the bounded-audit contract), then recall@3
    // and warm seconds per nprobe. nprobe=k is the spec-pinned
    // exhaustive-ADC identity, so its recall is the PQ ceiling.
    import org.apache.spark.sql.expressions.Window
    val wx = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    val exact = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .join(emb.select(col("vec_id").as("neighbor_id"),
        col("embedding").as("ne")),
        col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", expr("cosine_sim(qe, ne)"))
      .withColumn("rn", row_number().over(wx))
      .filter(col("rn") <= 3)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def searchSet(np: Int): Set[(Long, Long)] = graft.operators.IvfPqIndex
      .search(spark, dir, emb, col("vec_id") < 10, 3, np)
      .select(col("query_id"), col("neighbor_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // two recall columns: vs the EXACT cosine top-3 (bounded by PQ
    // resolution — flat on a neighbor-free isotropic corpus) and vs
    // the EXHAUSTIVE-ADC top-3 (the pure nprobe knob: how much of what
    // full ADC would return do truncated probes recover)
    val adcRef = searchSet(k)
    for (np <- Seq(1, 2, 4, 8, 16, 32, 64, k)) {
      searchSet(np) // warm the plan/caches like the nprobe=2 rows above
      val t0 = System.nanoTime()
      val hits = searchSet(np)
      val warm = (System.nanoTime() - t0) / 1e9
      val label = if (np == k) s"$np (all lists)" else np.toString
      println(f"[ivfpq] nprobe=$label%-16s recall@3=${(exact & hits).size}%2d/${exact.size}  adc@3=${(adcRef & hits).size}%2d/${adcRef.size}  warm=$warm%6.2fs")
    }

    // Two-stage rerank off the artifact (the ann13 shape, here driven
    // by the persisted index): R=10 compressed-domain shortlist per
    // nprobe, then EXACT cosine on the Q×R pairs only. Quantifies how
    // much of the PQ-resolution recall loss — including the
    // more-candidates-more-distractors effect where exhaustive ADC
    // ranks true neighbors WORSE than truncated probes — the exact
    // rerank stage recovers at each probe width.
    // R sweep (VERDICT r9 #5): the 200k-vector probe showed a fixed
    // R=10 shortlist cannot separate ε-twin groups DEEPER than R — on
    // a near-duplicate-heavy corpus every slot fills with byte-similar
    // twins of the same original before a second original's neighbors
    // make the list. The knob must scale with expected duplicate-group
    // depth (R ≳ group size × k_wanted); the sweep quantifies exactly
    // what each widening buys at this corpus's group depth.
    def rerankRecall(np: Int, r: Int): Int = {
      val short = graft.operators.IvfPqIndex
        .search(spark, dir, emb, col("vec_id") < 10, r, np)
        .select(col("query_id"), col("neighbor_id"))
      val rr = short
        .join(emb.select(col("vec_id").as("query_id"),
          col("embedding").as("qe")), Seq("query_id"))
        .join(emb.select(col("vec_id").as("neighbor_id"),
          col("embedding").as("ne")), Seq("neighbor_id"))
        .withColumn("cos", expr("cosine_sim(qe, ne)"))
        .withColumn("rn", row_number().over(wx))
        .filter(col("rn") <= 3)
        .select(col("query_id"), col("neighbor_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & rr).size
    }
    for (np <- Seq(1, 4, k); r <- Seq(10, 30, 100)) {
      val label = if (np == k) s"$np (all lists)" else np.toString
      println(f"[ivfpq] rerank np=$label%-13s R=$r%-4d recall@3=${rerankRecall(np, r)}%2d/${exact.size} (compressed shortlist + exact re-rank)")
    }

    // Auto-derived R (VERDICT r10 #6): the duplicate-group depth is
    // MEASURED, not assumed — near-dup component census from the
    // index's own lists (within-list pairs at cos ≥ 0.9, the blocked
    // pair generation dd10 uses, → connected components → size
    // census), fed through IvfPqIndex.shortlistR. On the ε-twin
    // stretch this derives R ≈ group_depth × 3 and recovers full
    // recall at nprobe=1 with no hand tuning.
    val withEmb = spark.read.parquet(s"$dir/lists")
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
    val pairs = withEmb
      .select(col("cid"), col("vec_id").as("da"),
        col("embedding").as("ea"))
      .join(withEmb.select(col("cid"), col("vec_id").as("db"),
        col("embedding").as("eb")), Seq("cid"))
      .filter(col("da") < col("db"))
      .filter(expr("cosine_sim(ea, eb)") >= 0.9)
      .select(col("da"), col("db"))
    val census = graft.operators.Graph
      .connectedComponents(pairs, "da", "db")
      .groupBy(col("component")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_components"))
    val tAuto = System.nanoTime()
    val autoR = graft.operators.IvfPqIndex.shortlistR(census, 3)
    val censusSec = (System.nanoTime() - tAuto) / 1e9
    println(f"[ivfpq] auto-R: near-dup census -> R=$autoR (census ${censusSec}%.1fs)")
    for (np <- Seq(1, 4)) {
      println(f"[ivfpq] rerank np=$np%-13d R=$autoR%-4d recall@3=${rerankRecall(np, autoR)}%2d/${exact.size} (AUTO-derived R)")
    }
    spark.stop()
  }
}
