package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Ops
import graft.sources.ToxvaldbAdapter

/** The SURVEY §7.4 risk-6 exactness seam, exercised END-TO-END through
  * a real integrator (VERDICT r9 #8): the toxvaldb median binarization
  * runs in both modes, and the spec pins (a) that the conf switch is
  * live — default/exact reproduces the oracle-gated h13 frame, approx
  * actually changes the dispatch — and (b) the cross-mode TOLERANCE
  * contract: the approx median is a real data value rank-adjacent to
  * the exact median, so binarization labels may flip ONLY for rows
  * whose value falls inside the band between the two medians.
  */
class ExactnessSpec extends SparkSpec {

  private def acts(mode: Ops.Exactness) =
    ToxvaldbAdapter.stagingMode(spark, sf(), mode).activities

  test("conf dispatch: default exact, approx switches, junk rejected") {
    assert(Ops.exactnessFromConf(spark) == Ops.Exact)
    spark.conf.set(Ops.ExactnessKey, "approx")
    try assert(Ops.exactnessFromConf(spark) == Ops.Approx)
    finally spark.conf.unset(Ops.ExactnessKey)
    spark.conf.set(Ops.ExactnessKey, "mostly-exact")
    try intercept[IllegalArgumentException] { Ops.exactnessFromConf(spark) }
    finally spark.conf.unset(Ops.ExactnessKey)
  }

  test("exact mode is the oracle-pinned h13 staging, bit-identical") {
    val viaConf = ToxvaldbAdapter.staging(spark, sf()).activities
    val explicit = acts(Ops.Exact)
    assert(viaConf.exceptAll(explicit).count() == 0 &&
      explicit.exceptAll(viaConf).count() == 0)
  }

  test("approx-mode labels flip only inside the exact-vs-approx median band") {
    val exact = acts(Ops.Exact)
      .select(col("aid"), col("numvalue"), col("value").as("v_exact"))
    val approx = acts(Ops.Approx)
      .select(col("aid"), col("value").as("v_approx"))
    // same pairs survive in both modes: the support floor and the key
    // derivation are mode-independent, only the label may move
    val joined = exact.join(approx, Seq("aid"), "full")
    assert(joined.filter(col("v_exact").isNull || col("v_approx").isNull)
      .count() == 0, "mode switch changed the surviving pair set")

    // per-property medians under both modes, recomputed from the pair
    // frame the adapter binarizes (pid is a bijection of the group key)
    val grouped = ToxvaldbAdapter.stagingMode(spark, sf(), Ops.Exact)
      .activities.select(col("pid"), col("numvalue"))
    val mExact = Ops.groupedMedian(grouped, Seq("pid"), "numvalue",
      "m_exact", Ops.Exact)
    val mApprox = Ops.groupedMedian(grouped, Seq("pid"), "numvalue",
      "m_approx", Ops.Approx)
    val meds = mExact.join(mApprox, Seq("pid"))

    // tolerance contract 1: the approx median is a REAL value of the
    // group, rank-adjacent to the exact median (rank error < 1 at
    // accuracy 10000 and gate-scale groups): it must lie between the
    // order statistics one below and one above the middle pair
    val w = Window.partitionBy(col("pid")).orderBy(col("numvalue"))
    val cw = Window.partitionBy(col("pid"))
    val banded = grouped
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(cw))
      .withColumn("lo_rank", greatest(lit(1), expr("(n + 1) div 2 - 1")))
      .withColumn("hi_rank", least(col("n"), expr("n div 2 + 2")))
      .groupBy(col("pid"))
      .agg(min(when(col("rn") === col("lo_rank"), col("numvalue")))
        .as("lo"),
        min(when(col("rn") === col("hi_rank"), col("numvalue"))).as("hi"))
    val viol = meds.join(banded, Seq("pid"))
      .filter(col("m_approx") < col("lo") || col("m_approx") > col("hi"))
    assert(viol.count() == 0,
      s"approx median outside the rank-adjacent band: ${viol.collect().mkString(",")}")

    // tolerance contract 2: a label flip is legal ONLY when the row's
    // value lies inside [min(med), max(med)) of its property — the
    // band the two formulations genuinely disagree on
    val actsWithPid = acts(Ops.Exact).select(col("aid"), col("pid"))
    val flips = joined.filter(col("v_exact") =!= col("v_approx"))
      .join(actsWithPid, Seq("aid"))
      .join(meds, Seq("pid"))
      .filter(!(col("numvalue") >= least(col("m_exact"), col("m_approx")) &&
        col("numvalue") < greatest(col("m_exact"), col("m_approx"))))
    assert(flips.count() == 0,
      s"label flipped outside the median band: ${flips.collect().take(5).mkString(",")}")
  }
}
