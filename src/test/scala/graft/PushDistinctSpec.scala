package graft

import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Union}
import org.apache.spark.sql.functions._
import graft.plans.PushDistinctThroughUnion

class PushDistinctSpec extends SparkSpec {
  import spark.implicits._

  private def distinctUnion() = {
    val a = Seq(1, 1, 1, 2).toDF("x")
    val b = Seq(2, 2, 3, 3).toDF("x")
    a.union(b).distinct()
  }

  test("rewrites distinct-of-union into per-branch pre-dedup, same result") {
    val before = distinctUnion()
    val expected = before.collect().map(_.getInt(0)).toSet

    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PushDistinctThroughUnion
    try {
      val after = distinctUnion()
      val optimized = after.queryExecution.optimizedPlan
      // every union branch is now itself a distinct aggregate
      val unions = optimized.collect { case u: Union => u }
      assert(unions.nonEmpty)
      assert(unions.head.children.forall {
        case ag: Aggregate =>
          ag.groupingExpressions == ag.aggregateExpressions
        case _ => false
      }, s"branches not pre-deduped:\n$optimized")
      assert(after.collect().map(_.getInt(0)).toSet == expected)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == PushDistinctThroughUnion)
    }
  }

  test("rule is a fixed point (no repeated nesting on re-application)") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ PushDistinctThroughUnion
    try {
      val optimized = distinctUnion().queryExecution.optimizedPlan
      val nAggs = optimized.collect { case a: Aggregate => a }.size
      // 1 global + 2 branch aggregates, not more
      assert(nAggs == 3, s"expected 3 aggregates, got $nAggs:\n$optimized")
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations
          .filterNot(_ == PushDistinctThroughUnion)
    }
  }

  test("without the rule, branches are not pre-deduped (control)") {
    val optimized = distinctUnion().queryExecution.optimizedPlan
    val unions = optimized.collect { case u: Union => u }
    assert(unions.head.children.exists {
      case ag: Aggregate => false
      case _ => true
    })
  }
}
