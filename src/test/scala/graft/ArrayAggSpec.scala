package graft

import org.apache.spark.sql.functions._
import graft.functions.ArrayAgg

/** The two element-wise array-aggregation paths must agree: the builtin
  * composition (codegen'd HashAggregate, hot path) and the typed
  * Aggregator UDAF (ObjectHashAggregate, the custom-aggregation
  * extension point). Also pins plan shape: the builtin form must stay
  * in whole-stage codegen'd HashAggregate, the UDAF form in
  * ObjectHashAggregate.
  */
class ArrayAggSpec extends SparkSpec {
  import spark.implicits._

  private def input = Seq(
    (1L, Array(5L, 2L, 9L)), (1L, Array(3L, 7L, 1L)),
    (2L, Array(10L, 10L, 10L)), (2L, Array(-1L, 0L, 99L)),
    (3L, Array(4L, 4L, 4L))
  ).toDF("g", "arr")

  test("builtin and UDAF arrayMin agree") {
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val a = collectMap(input.groupBy(col("g"))
      .agg(ArrayAgg.arrayMin(3)(col("arr")).as("m")))
    val b = collectMap(input.groupBy(col("g"))
      .agg(ArrayAgg.arrayMinUdaf(3)(col("arr")).as("m")))
    assert(a == b)
    assert(a(1L) == Seq(3L, 2L, 1L))
    assert(a(2L) == Seq(-1L, 0L, 10L))
  }

  test("builtin and UDAF arraySum agree") {
    def collectMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val a = collectMap(input.groupBy(col("g"))
      .agg(ArrayAgg.arraySum(3)(col("arr")).as("m")))
    val b = collectMap(input.groupBy(col("g"))
      .agg(ArrayAgg.arraySumUdaf(3)(col("arr")).as("m")))
    assert(a == b)
    assert(a(1L) == Seq(8L, 9L, 10L))
  }

  test("builtin path plans as HashAggregate, UDAF as ObjectHashAggregate") {
    val builtin = input.groupBy(col("g"))
      .agg(ArrayAgg.arrayMin(3)(col("arr")))
      .queryExecution.executedPlan.toString
    assert(builtin.contains("HashAggregate"), builtin)
    assert(!builtin.contains("ObjectHashAggregate"), builtin)
    val udafPlan = input.groupBy(col("g"))
      .agg(ArrayAgg.arrayMinUdaf(3)(col("arr")))
      .queryExecution.executedPlan.toString
    assert(udafPlan.contains("ObjectHashAggregate"), udafPlan)
  }

  test("off-contract short arrays: builtin throws (ANSI), UDAF clamps") {
    val short = Seq((1L, Array(5L)), (1L, Array(3L, 7L, 9L)))
      .toDF("g", "arr")
    // builtin element_at(arr, 2) on a length-1 array throws under Spark
    // 4's default ANSI mode — the contract violation is loud
    intercept[Exception] {
      short.groupBy(col("g"))
        .agg(ArrayAgg.arrayMin(3)(col("arr"))).collect()
    }
    // the Aggregator clamps to the row's length: missing slots keep the
    // unit element from the other rows
    val clamped = short.groupBy(col("g"))
      .agg(ArrayAgg.arrayMinUdaf(3)(col("arr")).as("m"))
      .collect().map(r => r.getSeq[Long](1)).head
    assert(clamped == Seq(3L, 7L, 9L))
  }
}
