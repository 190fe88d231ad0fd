package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Bucketing — the co-located-join scale strategy (brief: "bucketing for
  * co-located joins"). Two tables bucketed on the join key join without
  * any shuffle exchange; the same join unbucketed shuffles both sides.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of co-bucketed tables runs without a shuffle exchange") {
    // explicit per-table paths (warehouse.dir is a static conf); the
    // catalog entries are dropped in the finally block
    val wh = Files.createTempDirectory("graft-warehouse").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = Tables.orders(spark, sf())
      val customer = Tables.customer(spark, sf())
      orders.write.mode("overwrite")
        .bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      customer.write.mode("overwrite")
        .bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/customer_b").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join should not shuffle:\n$plan")

      // and it computes the same result as the plain join
      val expected = orders.join(customer,
        col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)

      val unbucketed = orders.join(customer,
        col("o_custkey") === col("c_custkey"))
      assert(unbucketed.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"),
        "sanity: the unbucketed join does shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
