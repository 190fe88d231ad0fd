package graft

/** Plan-shape guards for queries whose WHOLE value is avoiding a bad
  * physical shape — a regression here stays correct on test data and
  * melts down at corpus scale, so the plan itself is the contract.
  */
class PlanShapeSpec extends SparkSpec {

  private def physical(name: String): String =
    SparkEntry.queries(name)(spark, sf())
      .queryExecution.executedPlan.toString

  test("j14 fuzzy join never plans a cartesian/nested-loop join") {
    val plan = physical("j14_fuzzy_join")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("x8 decontamination joins via broadcast, no corpus-side sort") {
    val plan = physical("x8_decontamination")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("u7 merge gets the WindowGroupLimit rank-limit pushdown") {
    val plan = physical("u7_upsert_latest")
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("o2 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val plan = physical("o2_top_k")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("f15 binning is map-side on literal edges, no exact-percentile buffer") {
    // edges come from Ops.exactQuantiles (count pass + distributed sort
    // + rank pick) as scalars, so the binning plan itself is one
    // scan→case_when→aggregate: no Window, no join at all, and — the r3
    // weak mark — no single ungrouped ObjectHashAggregate buffering the
    // whole column
    val plan = physical("f15_quantile_bins")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("ObjectHashAggregate"), plan)
  }
}
