package graft

import org.apache.spark.sql.functions._
import graft.operators.Ops

class OpsSpec extends SparkSpec {
  import spark.implicits._

  test("binarizeByMedian splits on the exact per-group median") {
    val df = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0),   // median 2.0
      ("b", 10.0), ("b", 20.0)              // median 15.0 (interpolated)
    ).toDF("g", "v")
    val out = Ops.binarizeByMedian(df, "v", "g").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getString(2))).toSet
    assert(out == Set(
      ("a", 1.0, "negative"), ("a", 2.0, "positive"), ("a", 3.0, "positive"),
      ("b", 10.0, "negative"), ("b", 20.0, "positive")))
  }

  test("groupSupportFilter keeps only groups with >= minN rows") {
    val df = Seq("a", "a", "a", "b").toDF("g")
    val out = Ops.groupSupportFilter(df, Seq("g"), 3)
    assert(out.collect().map(_.getString(0)).toSeq == Seq("a", "a", "a"))
  }

  test("discordanceFilter drops keys with conflicting values") {
    val df = Seq(("k1", "pos"), ("k1", "pos"), ("k2", "pos"), ("k2", "neg"))
      .toDF("k", "v")
    val out = Ops.discordanceFilter(df, Seq("k"), "v")
    assert(out.collect().map(_.getString(0)).toSet == Set("k1"))
  }

  test("synthesizeNegatives fills the missing grid cells") {
    val df = Seq((1L, "x"), (1L, "y"), (2L, "x")).toDF("s", "p")
    val out = Ops.synthesizeNegatives(df, "s", "p")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(out == Set(
      (1L, "x", "positive"), (1L, "y", "positive"),
      (2L, "x", "positive"), (2L, "y", "negative")))
  }

  test("stratifiedExactSample returns exactly n per stratum, deterministically") {
    val df = (1 to 100).map(i => (if (i % 2 == 0) "even" else "odd", i))
      .toDF("stratum", "id")
    val a = Ops.stratifiedExactSample(df, "stratum", Seq("id"), 10)
    val b = Ops.stratifiedExactSample(df.repartition(7), "stratum", Seq("id"), 10)
    val countA = a.groupBy("stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(countA == Map("even" -> 10L, "odd" -> 10L))
    // same rows regardless of input partitioning
    assert(a.select("id").collect().map(_.getInt(0)).toSet
      == b.select("id").collect().map(_.getInt(0)).toSet)
  }

  test("asOfJoin picks the latest right row at or before each left ts") {
    val left = Seq((1L, 10L, "e1"), (1L, 25L, "e2"), (1L, 5L, "e0"),
      (2L, 50L, "e3")).toDF("k", "ts", "ev")
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20"), (2L, 60L, "r60"))
      .toDF("k", "ts", "payload")
    val out = Ops.asOfJoin(left, right, "k", "ts")
      .select("ev", "asof_payload")
      .collect().map(r => r.getString(0) -> Option(r.getString(1))).toMap
    assert(out == Map(
      "e0" -> None,            // before any right row
      "e1" -> Some("r10"),     // ties match (>= semantics)
      "e2" -> Some("r20"),     // latest prior
      "e3" -> None))           // right row is after the event
  }

  test("saltedJoin is row-identical to the plain join") {
    val big = (1 to 1000).map(i => (i % 3, i)).toDF("k", "id")
    val small = Seq((0, "a"), (1, "b"), (2, "c")).toDF("k", "v")
    val salted = Ops.saltedJoin(big, small, "k", "id", 8)
    val plain = big.join(small, Seq("k"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("Approx exactness mode tracks Exact on real data") {
    val ev = Tables.events(spark, sf()).select("event_type", "value")
    val exact = Ops.binarizeByMedian(ev, "value", "event_type",
        mode = Ops.Exact)
      .groupBy("event_type", "value").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    val approx = Ops.binarizeByMedian(ev, "value", "event_type",
        mode = Ops.Approx)
      .groupBy("event_type", "value").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // same keys; class counts within 5% (approx median shifts the split
    // by at most a few rank positions)
    assert(exact.keySet == approx.keySet)
    exact.foreach { case (k, n) =>
      assert(math.abs(approx(k) - n) <= math.max(5, n / 20),
        s"$k: exact=$n approx=${approx(k)}")
    }
  }

  test("groupedMedianBySort is bit-identical to percentile on real data") {
    // both even- and odd-sized groups; values are arbitrary doubles so
    // interpolation bit-compat (lower + (upper-lower)*0.5) is exercised
    val ev = Tables.events(spark, sf())
    val viaSort = Ops.groupedMedianBySort(ev,
        Seq("user_id", "event_type"), "value", "m")
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    val viaPercentile = ev.groupBy(col("user_id"), col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("m"))
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    assert(viaSort.size == viaPercentile.size)
    viaPercentile.foreach { case (k, v) =>
      // bit equality, not epsilon
      assert(java.lang.Double.doubleToRawLongBits(viaSort(k)) ==
        java.lang.Double.doubleToRawLongBits(v), s"$k: ${viaSort(k)} != $v")
    }
  }

  test("groupedMedianBySort keeps all-NULL groups like percentile does") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(3.0)), ("b", None), ("b", None),
      ("c", Some(5.0)), ("c", None)
    ).toDF("g", "v")
    val got = Ops.groupedMedianBySort(df, Seq("g"), "v", "m")
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map("a" -> Some(2.0), "b" -> None, "c" -> Some(5.0)))
  }

  test("exactQuantiles is bit-identical to the percentile aggregate") {
    val li = Tables.lineitem(spark, sf())
    val ps = Seq(0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    val got = Ops.exactQuantiles(li, "l_extendedprice", ps)
    val want = li.agg(expr(
      s"percentile(l_extendedprice, array(${ps.mkString(",")}))"))
      .collect().head.getSeq[Double](0)
    assert(got == want, s"$got vs $want")
    // empty input behaves like the aggregate's no-rows case
    assert(Ops.exactQuantiles(li.filter(lit(false)), "l_extendedprice",
      Seq(0.5)).head.isNaN)
  }

  test("globalRowIndex numbers the corpus contiguously in key order") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .withColumn("hk", md5(col("doc_id").cast("string")))
    val n = docs.count()
    val idx = Ops.globalRowIndex(docs, "hk")
    val rows = idx.select(col("pos"), col("hk")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    // exactly 0..n-1, each once
    assert(rows.map(_._1).toSeq == (0L until n).toSeq)
    // position order IS key order
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq)
    // deterministic across runs and partitioning
    val again = Ops.globalRowIndex(docs.repartition(7), "hk")
      .select(col("pos"), col("hk")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    assert(rows.toSeq == again.toSeq)
  }

  test("groupedMedianBySort keeps a NULL group KEY (groupBy semantics)") {
    val df = Seq[(Option[String], Option[Double])](
      (None, Some(1.0)), (None, Some(3.0)), (Some("a"), Some(4.0))
    ).toDF("g", "v")
    val got = Ops.groupedMedianBySort(df, Seq("g"), "v", "m")
      .collect().map(r =>
        (if (r.isNullAt(0)) None else Some(r.getString(0))) ->
          (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    // null is a real key for groupBy; the join-back must be null-safe
    assert(got == Map(None -> Some(2.0), Some("a") -> Some(4.0)))
  }

  test("groupedQuantilesBySort is bit-identical to percentile on real data") {
    val li = spark.read.parquet(s"${sf()}/lineitem.parquet")
    val sorted = Ops.groupedQuantilesBySort(li, Seq("l_returnflag"),
        "l_extendedprice", Seq(0.25, 0.5, 0.75, 0.9),
        Seq("q25", "q50", "q75", "q90"))
      .orderBy("l_returnflag").collect()
    val agg = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, 0.25)").as("q25"),
        expr("percentile(l_extendedprice, 0.5)").as("q50"),
        expr("percentile(l_extendedprice, 0.75)").as("q75"),
        expr("percentile(l_extendedprice, 0.9)").as("q90"))
      .orderBy("l_returnflag").collect()
    assert(sorted.length == agg.length && sorted.nonEmpty)
    sorted.zip(agg).foreach { case (a, b) =>
      assert(a.getString(0) == b.getString(0))
      (1 to 4).foreach { i =>
        // bit-identical, not approximately equal
        assert(java.lang.Double.doubleToLongBits(a.getDouble(i)) ==
          java.lang.Double.doubleToLongBits(b.getDouble(i)),
          s"${a.getString(0)} q$i: ${a.getDouble(i)} vs ${b.getDouble(i)}")
      }
    }
  }

  test("groupedQuantilesBySort keeps all-NULL groups like percentile") {
    val df = Seq[(String, Option[Double])](
      ("a", Some(1.0)), ("a", Some(2.0)), ("b", None)
    ).toDF("g", "v")
    val got = Ops.groupedQuantilesBySort(df, Seq("g"), "v",
        Seq(0.5), Seq("q50")).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got == Map("a" -> Some(1.5), "b" -> None))
  }

  test("intervalOverlapJoin matches the naive inequality join exactly once") {
    // deterministic pseudo-random intervals spanning MANY bins (len up
    // to 40 vs binWidth 10) so multi-shared-bin pairs exist and the
    // first-shared-bin dedupe is actually exercised; inclusive
    // endpoints and touch-only overlaps included (s2 == e1)
    val iv = (1 to 300).map { i =>
      val s = (i * 37) % 200
      (i % 5, i.toLong, s.toLong, (s + (i * 13) % 41).toLong)
    }.toDF("k", "id", "s", "e")
    val a = iv.select(col("k"), col("id").as("ka"),
      col("s").as("sa"), col("e").as("ea"))
    val b = iv.select(col("k"), col("id").as("kb"),
      col("s").as("sb"), col("e").as("eb"))
    val fast = Ops.intervalOverlapJoin(a, b, "k",
        "sa", "ea", "sb", "eb", binWidth = 10L)
      .filter(col("ka") < col("kb"))
      .select("ka", "kb")
    val naive = a.join(b,
        a("k") === b("k") && col("ka") < col("kb") &&
          col("sa") <= col("eb") && col("sb") <= col("ea"))
      .select("ka", "kb")
    val fastRows = fast.collect().map(r => (r.getLong(0), r.getLong(1)))
    // exactly once: no duplicate pair survives the bin explosion
    assert(fastRows.length == fastRows.distinct.length)
    assert(fastRows.toSet ==
      naive.collect().map(r => (r.getLong(0), r.getLong(1))).toSet)
    assert(fastRows.nonEmpty)
    // the derive-by-default overload (pooled-span median width) is
    // pair-identical and still exactly-once — binWidth is a plan knob
    val derivedRows = Ops.intervalOverlapJoin(a, b, "k",
        "sa", "ea", "sb", "eb")
      .filter(col("ka") < col("kb")).select("ka", "kb")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(derivedRows.length == derivedRows.distinct.length)
    assert(derivedRows.toSet == fastRows.toSet)
  }
}
