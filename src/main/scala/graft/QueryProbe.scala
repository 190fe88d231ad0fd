package graft

/** Single-query measurement harness for optimization work:
  * `runMain graft.QueryProbe <sfDir> <planDir> <query> [query...]`
  * runs each named query through the SAME checksum barrier as the bench
  * (Bench.force — full materialization, no subtree pruning), one cold
  * pass plus `SPARK_GRAFT_PROBE_PASSES` (default 3) warm passes, prints
  * per-pass seconds, and dumps the AQE-final formatted plan of the last
  * warm pass to `<planDir>/<query>.txt`. This is the guide-§1 loop at
  * per-query granularity — iterate on one operator without paying a
  * full 206-query bench run per measurement. Timings are comparable to
  * the bench's warm medians only approximately (a probe session builds
  * just the memos its queries touch); final numbers always come from
  * the full `graft.Bench`.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: runMain graft.QueryProbe <sfDir> <planDir> <query> [query...]")
    val sfDir = args(0)
    val planDir = args(1)
    val names = args.drop(2).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus, "graft-probe")
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.quietGlobalWindowWarns(spark)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val passes =
      sys.env.get("SPARK_GRAFT_PROBE_PASSES").map(_.toInt).getOrElse(3)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(planDir))
    names.foreach { n =>
      spark.sparkContext.setJobDescription(s"probe $n")
      var last: Option[org.apache.spark.sql.DataFrame] = None
      val times = (0 to passes).map { _ =>
        val t0 = System.nanoTime()
        val df = Bench.force(SparkEntry.queries(n)(spark, sfDir))
        last = Some(df)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n cold=${times.head}%.3f warm=" +
        times.tail.map(t => f"$t%.3f").mkString(","))
      last.foreach { df =>
        java.nio.file.Files.write(
          java.nio.file.Paths.get(planDir, s"$n.txt"),
          df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
      }
    }
    spark.stop()
  }
}
