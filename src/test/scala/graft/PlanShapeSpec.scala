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

  test("q20 fraction-of-group is one window pass, no self-join of the agg") {
    // the Q20 correlated threshold could decorrelate into groupBy +
    // self-join (two shuffles + a duplicate scan); the window form
    // re-uses the grouped frame's partitioning — exactly one Window and
    // the only joins are the part filter + supplier dim lookups
    val plan = physical("q20_dominant_supplier")
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("SortMergeJoin"), // both dims broadcast at sf
      plan.linesIterator.filter(_.contains("Join")).mkString("\n"))
  }

  test("q21 exists/not-exists compile to semi and anti hash joins") {
    val plan = physical("q21_waiting_supplier")
    assert(plan.contains("LeftSemi"), plan)
    assert(plan.contains("LeftAnti"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("st6 outer face keeps the binned equi-join, no cartesian pairing") {
    // the single-row aggregate crossJoins plan as broadcast nested
    // loops over one row (fine); the contract is that the PAIRING
    // itself is never a cartesian product — the range join stays an
    // equi-join on (user, bin) and the remainder a left-anti hash join
    val plan = physical("st6_outer_attribution")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q4 exists compiles to one left-semi join, no distinct pass") {
    // the correlated EXISTS must become a single left-semi hash join
    // with the date inequality as a residual — never a decorrelated
    // distinct + inner join (extra shuffle) or a nested-loop probe
    val plan = physical("q4_priority_check")
    assert(plan.contains("LeftSemi"), plan)
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("HashAggregate(keys=[l_orderkey"), plan)
  }

  test("q15 scalar-max subquery reuses the revenue aggregate") {
    // both consumers of the revenue view (the max and the equality
    // filter) must share ONE scan+aggregate via exchange reuse; without
    // the canonicalization-matching isNotNull in the query, the max
    // branch silently re-scans lineitem — fine at sf, double I/O at
    // 100 TB. Executed (AQE-final) plan: exactly one lineitem FileScan.
    val df = SparkEntry.queries("q15_top_supplier")(spark, sf())
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    val finalPlan = full.split("== Initial Plan ==").head
    assert(finalPlan.contains("ReusedExchange"), full)
    val lineitemScans = finalPlan.linesIterator
      .count(l => l.contains("FileScan") && l.contains("lineitem"))
    assert(lineitemScans == 1, finalPlan)
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

  private def stagingPlan(a: graft.sources.SourceAdapter): String =
    a.staging(spark, sf()).activities.queryExecution.executedPlan.toString

  test("new integrator stagings: dims broadcast, no cartesian, no global window") {
    // the five round-6 adapters each carry a dim join (comptox / GHS
    // TSV / assay slice) that must broadcast, and several window passes
    // that must all be PARTITIONED (a Window with an empty partition
    // spec is the single-partition shape that dies at corpus scale)
    Seq(graft.sources.ToxvaldbAdapter, graft.sources.Tox21Adapter,
      graft.sources.ToxcastAdapter, graft.sources.ReachAdapter,
      graft.sources.PubchemAdapter, graft.sources.SiderAdapter)
      .foreach { a =>
      val plan = stagingPlan(a)
      assert(!plan.contains("CartesianProduct"), s"${a.name}:\n$plan")
      // every windowspec in the plan names at least one partition col:
      // "Window [..], [part cols], [order]" — an unpartitioned window
      // prints "Window [..], [order]" with no partition list between
      assert(!plan.linesIterator.exists(l =>
        l.trim.startsWith("Window ") && l.contains("], []")),
        s"${a.name} has an unpartitioned window:\n$plan")
    }
    // the structure/lookup dims actually broadcast
    assert(stagingPlan(graft.sources.ToxvaldbAdapter)
      .contains("BroadcastHashJoin"))
    assert(stagingPlan(graft.sources.ReachAdapter)
      .contains("BroadcastHashJoin"))
  }

  test("tox21 expansion is a Generate (map-side explode), not a join") {
    val plan = stagingPlan(graft.sources.Tox21Adapter)
    assert(plan.contains("Generate"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("sider multi-label staging is exchange-free (scan→filter→unpivot)") {
    // the reference loops one slice per label column and unions them
    // (N scans); the Spark-first form is ONE native unpivot — an Expand
    // over a single scan with no shuffle anywhere in the activities
    // staging, the best possible shape for a melt at 100 TB
    val plan = stagingPlan(graft.sources.SiderAdapter)
    assert(plan.contains("Expand"), plan)
    assert(!plan.contains("Exchange"), plan)
  }

  test("pubchem single-entry filter is one partitioned window over the slice") {
    val plan = stagingPlan(graft.sources.PubchemAdapter)
    // the count-over-id window partitions by the compound id
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
