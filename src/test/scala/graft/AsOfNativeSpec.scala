package graft

import org.apache.spark.sql.functions._
import graft.operators.Ops
import graft.plans.AsOf

class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of matches the composed union+window as-of on fixtures") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 5L, "e0"),
      (2L, 50L, "e3"), (3L, 7L, "e4")).toDF("k", "ts", "ev")
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 60L, "r60"))
      .toDF("k", "ts", "payload")
    val native = AsOf.asOfJoinNative(left, right, "k", "ts")
      .select("ev", "payload")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(native == Map(
      "e0" -> None, "e1" -> Some("r10"), "e2" -> Some("r20"),
      "e3" -> None, "e4" -> None))
  }

  test("native as-of agrees with Ops.asOfJoin on real event/order data") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = Tables.orders(spark, sf())
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("ts"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val native = AsOf.asOfJoinNative(ev, r, "user_id", "ts")
      .select(col("event_id"), col("o_orderkey"))
    val composed = Ops.asOfJoin(ev, r, "user_id", "ts")
      .select(col("event_id"), col("asof_o_orderkey").as("o_orderkey"))
    assert(native.count() == ev.count())
    assert(native.exceptAll(composed).count() == 0)
    assert(composed.exceptAll(native).count() == 0)
  }

  test("rows survive a Sort/Exchange directly above (UnsafeRow contract)") {
    // SortExec and ShuffleExchangeExec cast input rows to UnsafeRow; the
    // exec must project its JoinedRow output (ADVICE r1). No intervening
    // Project here — orderBy consumes the join output directly.
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (2L, 50L, "e3"))
      .toDF("k", "ts", "ev")
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20"))
      .toDF("k", "ts", "payload")
    val sorted = AsOf.asOfJoinNative(left, right, "k", "ts")
      .orderBy(desc("ts"))
    val rows = sorted.collect()
    assert(rows.map(_.getString(2)).toSeq == Seq("e3", "e2", "e1"))
    assert(Option(rows(0).getString(3)).isEmpty)  // e3: no match -> null
    assert(rows(1).getString(3) == "r20")
    // and through a repartition (ShuffleExchangeExec above the join)
    val n = AsOf.asOfJoinNative(left, right, "k", "ts")
      .repartition(4, col("ev")).count()
    assert(n == 3)
  }

  test("plans as a co-partitioned sorted merge (AsOfJoinNative node)") {
    val ev = Tables.events(spark, sf())
      .select(col("user_id"), col("ts"), col("event_id"))
    val r = Tables.orders(spark, sf())
      .groupBy(col("o_custkey").as("user_id"), col("o_orderdate").as("ts"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
    val plan = AsOf.asOfJoinNative(ev, r, "user_id", "ts")
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoinNative"), plan)
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort "), "children must be sorted")
  }
}
