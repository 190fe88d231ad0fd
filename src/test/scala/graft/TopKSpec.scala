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

  test("partial heaps run map-side, below the exchange") {
    val ev = Tables.events(spark, sf()).select("event_type", "value")
    val native = TopK.topKPerGroup(ev, Seq("event_type"), "value",
      desc = true, k = 3)
    val s = native.queryExecution.executedPlan.toString
    val iPartial = s.indexOf("TopKPerGroupPartial")
    val iExchange = s.indexOf("Exchange hashpartitioning")
    assert(iPartial >= 0, s)
    // tree prints final phase first, then the exchange, then the
    // map-side partial — i.e. the partial caps what the shuffle carries
    assert(iExchange >= 0 && iExchange < iPartial,
      s"partial phase must sit below the exchange:\n$s")
  }

  test("ascending mode and k larger than group size") {
    val df = Seq(("a", 3), ("a", 1), ("a", 2), ("b", 9)).toDF("g", "v")
    val out = TopK.topKPerGroup(df, Seq("g"), "v", desc = false, k = 2)
      .collect().map(r => (r.getString(0), r.getInt(1))).toSet
    assert(out == Set(("a", 1), ("a", 2), ("b", 9)))
  }

  test("auto dispatch: high-cardinality groups take the spillable sort path") {
    // every row its own group — the shape where the native exec's
    // per-partition heap map degenerates to holding the whole partition
    val wide = spark.range(0, 20000)
      .selectExpr("id AS g", "cast(id % 977 AS double) AS v")
    val auto = TopK.topKPerGroupAuto(wide, Seq("g"), "v",
      descending = true, k = 2, maxStateRows = 1000)
    val plan = auto.queryExecution.executedPlan.toString
    assert(!plan.contains("TopKPerGroup"), plan)
    assert(plan.contains("Window"), plan)
    assert(auto.count() == 20000) // one row per singleton group

    // bounded cardinality stays on the native heap exec
    val narrow = spark.range(0, 20000)
      .selectExpr("id % 7 AS g", "cast(id AS double) AS v")
    val native = TopK.topKPerGroupAuto(narrow, Seq("g"), "v",
      descending = true, k = 2, maxStateRows = 1000)
    assert(native.queryExecution.executedPlan.toString
      .contains("TopKPerGroup"))
    assert(native.count() == 14)
    // both paths agree on the retained (group, value) multiset
    val bySort = TopK.topKPerGroupBySort(narrow, Seq("g"), "v",
      descending = true, k = 2)
    assert(native.exceptAll(bySort).count() == 0)
    assert(bySort.exceptAll(native).count() == 0)
  }
  test("composite struct order: heap equals window on ties, NaN, and null") {
    // the composite-probe ordering contract (VERDICT r9 #3; since r13
    // the probe call sites use the fused NearestCentroids expression,
    // but TopKPerGroup keeps the same composite for its other
    // consumers — o9's weighted reservoir): ordering by
    // struct(score, -cid) DESC must retain and rank exactly the rows
    // the (score desc, cid asc) row_number window would — including a
    // NaN score (greatest), a null score (least), and exact ties
    import org.apache.spark.sql.expressions.Window
    val rows = Seq(
      (1L, 10L, 0.9), (1L, 20L, 0.9), (1L, 30L, 0.5),   // tie at 0.9
      (2L, 10L, Double.NaN), (2L, 20L, 1.0), (2L, 30L, 0.1),
      (4L, 10L, 0.2), (4L, 20L, 0.3), (4L, 30L, 0.4))
      .toDF("vec_id", "cid", "ccos")
      .union(Seq((3L, 10L), (3L, 20L)).toDF("vec_id", "cid")
        .withColumn("ccos", lit(null).cast("double")))
    val heap = TopK.topKPerGroup(
      rows.withColumn("__ord", struct(col("ccos"), (-col("cid")).as("nc"))),
      Seq("vec_id"), "__ord", desc = true, k = 2)
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("vec_id")).orderBy(col("__ord").desc)))
      .drop("__ord")
    val win = rows
      .withColumn("rk", row_number().over(Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))))
      .filter(col("rk") <= 2)
    assert(heap.exceptAll(win).count() == 0 &&
      win.exceptAll(heap).count() == 0,
      s"heap=${heap.collect().mkString(",")} win=${win.collect().mkString(",")}")
    // spot-pin the semantics the parity relies on
    val m = heap.collect().map(r =>
      (r.getLong(0), r.getInt(3)) -> r.getLong(1)).toMap
    assert(m((1L, 1)) == 10L && m((1L, 2)) == 20L)  // tie -> lowest cid
    assert(m((2L, 1)) == 10L)                        // NaN greatest
    assert(m((3L, 1)) == 10L && m((3L, 2)) == 20L)  // nulls still ranked
  }
  test("composite-order heap equals the window form on fuzzed frames") {
    // 20 random frames with duplicate scores, NaNs, nulls, skewed group
    // sizes, and k in 1..4 — the heap path and the row_number window
    // must retain the identical (group, cid, rk) multiset every time
    import org.apache.spark.sql.expressions.Window
    val rnd = new scala.util.Random(20260815L)
    (1 to 20).foreach { i =>
      val n = 50 + rnd.nextInt(400)
      val nGroups = 1 + rnd.nextInt(12)
      val k = 1 + rnd.nextInt(4)
      val rows = (1 to n).map { j =>
        val cos: java.lang.Double = rnd.nextInt(6) match {
          case 0 => Double.NaN
          case 1 => null
          case _ => math.rint(rnd.nextDouble() * 4) / 4.0 // forced ties
        }
        (rnd.nextInt(nGroups).toLong, j.toLong, cos)
      }
      val df = rows.toDF("vec_id", "cid", "ccos")
      val heap = TopK.topKPerGroup(
        df.withColumn("__ord", struct(col("ccos"), (-col("cid")).as("nc"))),
        Seq("vec_id"), "__ord", desc = true, k = k)
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id")).orderBy(col("__ord").desc)))
        .drop("__ord")
      val win = df
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("vec_id"))
            .orderBy(col("ccos").desc, col("cid"))))
        .filter(col("rk") <= k)
      assert(heap.exceptAll(win).count() == 0 &&
        win.exceptAll(heap).count() == 0,
        s"fuzz case $i (n=$n groups=$nGroups k=$k) diverged")
    }
  }
}
