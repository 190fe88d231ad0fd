package graft

import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** AQE skew-join handling — the runtime half of the skew story
  * (Ops.saltedJoin is the explicit half): a pathologically hot key is
  * split by AdaptiveSparkPlanExec at execution time, marked skew=true
  * in the final plan, with unchanged results.
  */
class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("AQE splits the hot partition and marks the join skew=true") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "8KB")
    val saved = confs.map { case (k, _) => k -> spark.conf.get(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val pad = "x" * 100
      // one hot key (80k rows) + 32 cold keys (100 rows each)
      val big = spark.range(80000).select(lit(1L).as("k"),
          concat(col("id").cast("string"), lit(pad)).as("payload"))
        .union(spark.range(3200).select((col("id") % 32 + 2).as("k"),
          concat(col("id").cast("string"), lit(pad)).as("payload")))
      val small = (1L to 33L).map(k => (k, s"dim$k")).toDF("k", "v")
      val joined = big.join(small, Seq("k"))
      // materialize THIS plan (count() would execute a different tree and
      // leave joined's adaptive plan unexecuted/non-final)
      val n = joined.toLocalIterator().asScala.size
      assert(n == 80000 + 3200)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew handling in final plan:\n$plan")
    } finally {
      saved.foreach { case (k, v) => spark.conf.set(k, v) }
    }
  }
}
