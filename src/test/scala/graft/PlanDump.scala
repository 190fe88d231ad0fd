package graft
object PlanDump {
  def main(args: Array[String]): Unit = {
    val d = args(0); val n = args(1)
    val spark = GraftSession.local("8", "plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(n)(spark, d)
    df.count() // build memos so the warm plan is the one dumped
    println("=== PLAN " + n + " ===")
    println(SparkEntry.queries(n)(spark, d).queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
