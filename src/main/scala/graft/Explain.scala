package graft

import org.apache.spark.sql.SparkSession

/** Plan audit tool: `runMain graft.Explain <sfDir> <query> [query...]`
  * prints the formatted physical plan (and optionally times execution)
  * for named SparkEntry queries. Used to keep every query's plan honest:
  * PushedFilters on scans, broadcast joins where intended, WholeStage
  * codegen coverage, no accidental global sorts.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = GraftSession.local(cpus, "graft-explain")
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      val t0 = System.nanoTime()
      val cnt = df.count()
      println(f"rows=$cnt time=${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
