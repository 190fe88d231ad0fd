package graft

import org.apache.spark.sql.functions._

/** GraftSession wires the whole extension surface: native function
  * registry, planner strategy, optimizer rule. (In-JVM getOrCreate
  * returns the shared test session — the point is that local() is
  * idempotent and leaves the session fully wired.)
  */
class GraftSessionSpec extends SparkSpec {
  import spark.implicits._

  test("local() wires functions, strategy, and rule idempotently") {
    val s1 = GraftSession.local("4")
    val s2 = GraftSession.local("4")
    assert(s1 eq s2)
    // native function resolves through the registry
    val v = Seq((Array(1.0f, 0.0f), Array(1.0f, 0.0f))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).collect()(0).getDouble(0)
    assert(math.abs(v - 1.0) < 1e-12)
    // strategy/rule present exactly once despite repeated local() calls
    assert(s1.experimental.extraStrategies.count(_ == plans.AsOfStrategy) == 1)
    assert(s1.experimental.extraOptimizations
      .count(_ == plans.PushDistinctThroughUnion) == 1)
    // and the native as-of plans without any manual registration
    val l = Seq((1L, 10L, "e")).toDF("k", "ts", "ev")
    val r = Seq((1L, 5L, "p")).toDF("k", "ts", "payload")
    val row = plans.AsOf.asOfJoinNative(l, r, "k", "ts").collect()(0)
    assert(row.getString(3) == "p")
  }
}
