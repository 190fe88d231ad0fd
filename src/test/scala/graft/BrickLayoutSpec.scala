package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.harmonize.Harmonize
import graft.sources.{Catalog, EventsAdapter, OrdersAdapter}

/** The bucketed brick layout: written once via Catalog.writeBrickBucketed,
  * downstream sid-joins run with zero shuffle exchange.
  */
class BrickLayoutSpec extends SparkSpec {

  test("bucketed brick join on sid elides the exchange and keeps the rows") {
    val brick = Harmonize.cachedBrick(spark, sf(),
      Seq(EventsAdapter, OrdersAdapter))
    val path = Files.createTempDirectory("graft-brick-b").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Catalog.writeBrickBucketed(spark, brick, path, db = "graft_t")

      val joined = spark.table("graft_t.activities_b")
        .join(spark.table("graft_t.substances_b"), "sid")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-bucketed sid join must not shuffle:\n$plan")

      // identical content to the in-memory brick join
      val expected = brick.activities.join(brick.substances, "sid").count()
      assert(joined.count() == expected && expected > 0)

      // a sid aggregation over the bucketed table also skips the exchange
      val agg = spark.table("graft_t.activities_b")
        .groupBy(col("sid")).agg(count(lit(1)))
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "bucketed groupBy(sid) should be exchange-free")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      Seq("activities_b", "substances_b", "properties_b").foreach(t =>
        spark.sql(s"DROP TABLE IF EXISTS graft_t.$t"))
      spark.sql("DROP DATABASE IF EXISTS graft_t")
    }
  }
}
