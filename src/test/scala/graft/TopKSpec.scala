package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopK, TopKPerGroupExec}

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("native top-k matches the window row_number result") {
    val ev = Tables.events(spark, sf()).select("event_type", "value", "event_id")
    val native = TopK.topKPerGroup(ev, Seq("event_type"), "value",
        desc = true, k = 5)
      .select("event_type", "value")
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("value").desc)
    val windowed = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).select("event_type", "value")
    // compare (group, value) multisets — row identity under exact value
    // ties is unspecified in both approaches
    assert(native.count() == windowed.count())
    assert(native.exceptAll(windowed).count() == 0)
    assert(windowed.exceptAll(native).count() == 0)
  }

  test("plans with TopKPerGroupExec and never sorts") {
    val ev = Tables.events(spark, sf()).select("event_type", "value")
    val native = TopK.topKPerGroup(ev, Seq("event_type"), "value",
      desc = true, k = 3)
    val plan = native.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), plan)
    assert(!plan.contains("Sort "), s"native top-k must not sort:\n$plan")
    assert(plan.contains("Exchange hashpartitioning"),
      "group clustering exchange expected")
  }

  test("ascending mode and k larger than group size") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val out = TopK.topKPerGroup(df, Seq("g"), "v", desc = false, k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 9)))
  }
}
