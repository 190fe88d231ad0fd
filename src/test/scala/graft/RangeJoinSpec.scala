package graft

import org.apache.spark.sql.functions._
import graft.operators.Ops

/** Ops.rangeJoin — the binned interval join. Result must be
  * row-identical to the naive key-join + range-filter formulation, and
  * the physical plan must be an equi-join on (key, bin), never a
  * nested-loop.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400L

  private def framesFromOrders = {
    val o = Tables.orders(spark, sf()).select(col("o_custkey"),
      col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("sec"))
    val points = o.select(col("o_custkey"), col("o_orderkey"), col("sec"))
    val anchors = o.select(col("o_custkey"),
      col("o_orderkey").as("anchor_key"),
      (col("sec") + 1).as("start"), (col("sec") + 30 * day).as("end"))
    (points, anchors)
  }

  test("bin join is pair-identical to the naive range filter") {
    val (points, anchors) = framesFromOrders
    val binned = Ops.rangeJoin(points, anchors, "o_custkey",
        "sec", "start", "end", binWidth = 7 * day)
      .select("anchor_key", "o_orderkey")
    val naive = points.join(anchors, Seq("o_custkey"))
      .filter(col("sec") >= col("start") && col("sec") <= col("end"))
      .select("anchor_key", "o_orderkey")
    assert(binned.count() > 0)
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    // no duplicated pairs from the interval explosion
    assert(binned.count() == binned.distinct().count())
  }

  test("plans as an equi-join on (key, bin), not a nested loop") {
    val (points, anchors) = framesFromOrders
    val plan = Ops.rangeJoin(points, anchors, "o_custkey",
        "sec", "start", "end", binWidth = 7 * day)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("__bin"), plan)
  }

  test("seeded random points/intervals: binned equals naive") {
    val rnd = new scala.util.Random(7)
    val points = (0 until 500).map(i =>
      (rnd.nextInt(20).toLong, i.toLong, rnd.nextInt(10000).toLong))
      .toDF("k", "id", "sec")
    val intervals = (0 until 200).map { i =>
      val s = rnd.nextInt(10000).toLong
      // widths from sub-bin to many-bin (bin width 300 below)
      (rnd.nextInt(20).toLong, (1000 + i).toLong, s,
        s + rnd.nextInt(2000).toLong)
    }.toDF("k", "ivid", "start", "end")
    val binned = Ops.rangeJoin(points, intervals, "k", "sec",
        "start", "end", binWidth = 300L)
      .select("ivid", "id")
    val naive = points.join(intervals, Seq("k"))
      .filter(col("sec") >= col("start") && col("sec") <= col("end"))
      .select("ivid", "id")
    assert(binned.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(binned).count() == 0)
    assert(binned.count() == binned.distinct().count())
  }

  test("derivedBinWidth lands on the hand-tuning rule, skew-resistant") {
    // uniform fixture: spans all ≈ L → derived ≈ L (the scaladoc rule
    // "binWidth ≈ typical interval length", previously hand-picked)
    val uniform = (0 until 1000).map(i =>
      (i.toLong, i * 10000L, i * 10000L + 290L + (i % 3) * 10))
      .toDF("ivid", "start", "end")
    val du = Ops.derivedBinWidth(uniform, "start", "end")
    assert(du >= 291L && du <= 311L, s"uniform: derived $du, expect ~301")
    // skewed fixture: 990 short (≈300) + 10 open-ended monsters (1e9).
    // A mean-based derivation would blow the width (and every short
    // interval's bin population) up ~3000×; the median ignores the tail
    val skewed = ((0 until 990).map(i =>
      (i.toLong, 0L, 299L)) ++ (0 until 10).map(i =>
      ((990 + i).toLong, 0L, 999999999L)))
      .toDF("ivid", "start", "end")
    val ds = Ops.derivedBinWidth(skewed, "start", "end")
    assert(ds == 300L, s"skewed: derived $ds, median must ignore the tail")
    // the derive-by-default overloads are row-identical to explicit
    // widths (binWidth is a plan knob, never a semantics knob)
    val (points, anchors) = framesFromOrders
    val derived = Ops.rangeJoin(points, anchors, "o_custkey",
      "sec", "start", "end").select("anchor_key", "o_orderkey")
    val explicit = Ops.rangeJoin(points, anchors, "o_custkey",
      "sec", "start", "end", binWidth = 7 * day)
      .select("anchor_key", "o_orderkey")
    assert(derived.exceptAll(explicit).count() == 0)
    assert(explicit.exceptAll(derived).count() == 0)
    // empty interval frame: fail loudly, not a NaN-width join
    val empty = uniform.filter(col("ivid") < 0)
    intercept[IllegalArgumentException] {
      Ops.derivedBinWidth(empty, "start", "end")
    }
  }

  test("intervals spanning many bins and empty results stay correct") {
    val points = Seq((1L, 10L, 100L), (1L, 11L, 5000L), (2L, 12L, 100L))
      .toDF("k", "id", "sec")
    // one 50-bin-wide interval, one that matches nothing
    val intervals = Seq((1L, 90L, 0L, 5000L), (2L, 91L, 900L, 950L))
      .toDF("k", "ivid", "start", "end")
    val out = Ops.rangeJoin(points, intervals, "k", "sec",
        "start", "end", binWidth = 100L)
      .select("ivid", "id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((90L, 10L), (90L, 11L)))
  }
}
