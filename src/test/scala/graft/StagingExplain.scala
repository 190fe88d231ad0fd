package graft

import graft.sources.SourceAdapter

/** Dev tool: print the RAW (pre-memo) staging plans per adapter —
  * `sbt "Test/runMain graft.StagingExplain [sfDir] [adapter...]"`.
  * The registered queries read stagings through the session checkpoint
  * memo, so `graft.Explain h1x_*` shows only the checkpoint scan; this
  * prints the plan the staging itself compiles to, the thing
  * PlanShapeSpec asserts over (broadcast dims, partitioned windows, no
  * cartesian, sider's exchange-free melt).
  */
object StagingExplain {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSet
      else SourceAdapter.all.map(_.name).toSet
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"), "staging-explain")
    spark.sparkContext.setLogLevel("ERROR")
    SourceAdapter.all.filter(a => names(a.name)).foreach { a =>
      println(s"\n========== ${a.name}.activities (raw staging) ==========")
      println(a.staging(spark, d).activities
        .queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
