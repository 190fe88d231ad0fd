package graft

/** Dev tool: time a SUBSET of SparkEntry queries at an arbitrary data
  * dir — `sbt "Test/runMain graft.QueryProbe <sfDir> <query> [query…]"`.
  * Each query runs one unmeasured cold pass (builds whatever session
  * memos it relies on) and two measured warm passes (min reported next
  * to both) — the Bench protocol, scoped so macro scale-steps (e.g. the
  * sf1 stretch, where a full 182-query Bench cold pass costs many
  * minutes of brick building) can probe one operator family.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    require(names.nonEmpty, "usage: QueryProbe <sfDir> <query> [query...]")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"), "query-probe")
    spark.sparkContext.setLogLevel("ERROR")
    StretchGen.ensure(spark, d): Unit
    spark.range(1000000).selectExpr("sum(id)").collect()
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      val t0c = System.nanoTime()
      Bench.force(fn(spark, d))                  // cold (memo build)
      val cold = (System.nanoTime() - t0c) / 1e9
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Bench.force(fn(spark, d))                // full-column barrier —
        (System.nanoTime() - t0) / 1e9           // count() lets Catalyst
      }                                          // prune whole subtrees
      println(f"[qprof] $n%-30s warm=${times.min}%6.2fs (passes ${times.map(t => f"$t%.2f").mkString("/")}) cold=$cold%6.2fs")
      // Same contract as Bench: SPARK_GRAFT_PLANS=<dir> dumps the
      // AQE-final executed plan per probed query for shape audits.
      sys.env.get("SPARK_GRAFT_PLANS").foreach { dir =>
        // dump the BARRIER frame's plan — the one that actually executed
        // (AQE-final, full pipeline under the one-row hash agg)
        val executed = Bench.force(fn(spark, d))
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$n.txt"),
          executed.queryExecution.executedPlan.toString
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      }
    }
    // VERDICT r13 #3 receipt: the fused expressions' quantizer-scale
    // centroid collect must run once per (session, corpus), not once
    // per call site — probe e.g. ann6+ann11+ann12+ann13+ann15 together
    // and expect 1 here (plus any index-build trainers' own collects).
    println(s"[qprof] centroid collects this session: " +
      graft.operators.KMeans.centroidCollects.get())
    spark.stop()
  }
}
