package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ops

/** Differential fuzzing of the OPERATOR LIBRARY (VERDICT r4 #6): the
  * hand-written DuckDB oracles pin each `Ops` operator at one call site;
  * this generates COMPOSITIONS — support filter ∘ discordance filter ∘
  * median binarization chained in random orders (with the binarized
  * "value" column feeding later steps), optionally fed by a salted join
  * — and checks every plan against an independent in-memory evaluator
  * (plain Scala collections, no shared code with the Spark paths).
  *
  * A second family drives `Ops.rangeJoin` with generated interval sets
  * and random bin widths against a nested-loop evaluator — the binning
  * decomposition must be invisible at every bin width.
  *
  * Determinism contract (same as DifferentialFuzzSpec): fixed seed,
  * binarize/sum restricted to integral-valued columns (exact in double
  * in any order at this size; the percentile interpolation
  * lower + (upper-lower)*0.5 over integral doubles is exact), ASCII-only
  * string ordering, inner joins only.
  */
class OpsFuzzSpec extends SparkSpec {
  import graft.Tables

  private val d = sf()

  private lazy val frames: Map[String, DataFrame] = Map(
    "customer" -> Tables.customer(spark, d),
    "orders" -> Tables.orders(spark, d),
    "lineitem" -> Tables.lineitem(spark, d))

  private lazy val rows: Map[String, Seq[Map[String, Any]]] =
    frames.map { case (n, df) =>
      val cols = df.columns
      n -> df.collect().toSeq.map(r =>
        cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
    }

  // categorical columns usable as group/discord keys (all non-null)
  private val catCols = Map(
    "customer" -> Seq("c_mktsegment", "c_nationkey"),
    "orders" -> Seq("o_orderstatus", "o_orderpriority"),
    "lineitem" -> Seq("l_returnflag", "l_linestatus", "l_linenumber"))
  // integral-valued numeric columns (exact sums/medians in double)
  private val intCols = Map(
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_quantity", "l_partkey", "l_suppkey"))
  // salted-join dims: (dim table, left key, right key, dim cols usable
  // as group keys after the join)
  private case class Dim(table: String, lk: String, rk: String,
      dimCats: Seq[String])
  private val dimFor = Map(
    "customer" -> Dim("nation", "c_nationkey", "n_nationkey", Seq("n_name")),
    "lineitem" -> Dim("part", "l_partkey", "p_partkey", Seq("p_brand")),
    "orders" -> Dim("customer", "o_custkey", "c_custkey",
      Seq("c_mktsegment")))
  private lazy val dimFrames: Map[String, DataFrame] = Map(
    "nation" -> Tables.nation(spark, d),
    "part" -> Tables.part(spark, d),
    "customer" -> Tables.customer(spark, d))
  private lazy val dimRows: Map[String, Seq[Map[String, Any]]] =
    dimFrames.map { case (n, df) =>
      val cols = df.columns
      n -> df.collect().toSeq.map(r =>
        cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
    }
  private val uniqueKey = Map("customer" -> "c_custkey",
    "orders" -> "o_orderkey", "lineitem" -> "l_orderkey")

  private sealed trait Step
  private case class Support(gcol: String, minN: Long) extends Step
  private case class Discord(keys: Seq[String], vcol: String) extends Step
  private case class Binarize(vcol: String, gcol: String) extends Step

  private case class OpsPlan(base: String, salted: Option[Dim],
      steps: Seq[Step], outKey: String, sumCol: String)

  private def norm(v: Any): Any = v match {
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case other => other
  }
  private def toD(v: Any): Double = v match {
    case d: Double => d
    case f: Float => f.toDouble
    case l: Long => l.toDouble
    case i: Int => i.toDouble
    case s: Short => s.toDouble
    case b: java.math.BigDecimal => b.doubleValue()
    case other => other.toString.toDouble
  }
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case _ => java.lang.Double.compare(toD(a), toD(b))
  }

  /** Spark's Percentile interpolation at p=0.5 over non-null values. */
  private def median(vs: Seq[Double]): Option[Double] = {
    if (vs.isEmpty) return None
    val s = vs.sorted
    val rank = (s.size - 1) * 0.5
    val lo = math.floor(rank).toInt
    val hi = math.ceil(rank).toInt
    Some(s(lo) + (s(hi) - s(lo)) * (rank - lo))
  }

  private def gen(rnd: scala.util.Random): OpsPlan = {
    val base = Seq("customer", "orders", "lineitem")(rnd.nextInt(3))
    val salted = if (rnd.nextInt(3) == 0) Some(dimFor(base)) else None
    val catPool0 = catCols(base) ++ salted.toSeq.flatMap(_.dimCats)
    var binarized = false
    val nSteps = 1 + rnd.nextInt(3)
    val steps = (0 until nSteps).flatMap { _ =>
      // "value" joins the categorical pool once a binarize has run
      val catPool = if (binarized) catPool0 :+ "value" else catPool0
      rnd.nextInt(3) match {
        case 0 =>
          val minN = Seq(2L, 5L, 20L, 200L)(rnd.nextInt(4))
          Some(Support(catPool(rnd.nextInt(catPool.size)), minN))
        case 1 =>
          val nk = 1 + rnd.nextInt(2)
          val keys = rnd.shuffle(catPool).take(nk)
          val vPool = catPool.filterNot(keys.contains)
          if (vPool.isEmpty) None
          else Some(Discord(keys, vPool(rnd.nextInt(vPool.size))))
        case _ if !binarized =>
          binarized = true
          Some(Binarize(intCols(base)(rnd.nextInt(intCols(base).size)),
            catPool(rnd.nextInt(catPool.size))))
        case _ => None
      }
    }
    val outPool = catPool0 ++ (if (binarized) Seq("value") else Nil)
    OpsPlan(base, salted, steps, outPool(rnd.nextInt(outPool.size)),
      intCols(base)(rnd.nextInt(intCols(base).size)))
  }

  private def runSpark(p: OpsPlan): Map[Any, (Long, Double)] = {
    var df = frames(p.base)
    p.salted.foreach { dim =>
      df = Ops.saltedJoin(df, dimFrames(dim.table)
          .withColumnRenamed(dim.rk, dim.lk),
        dim.lk, uniqueKey(p.base), 4)
    }
    p.steps.foreach {
      case Support(g, n) => df = Ops.groupSupportFilter(df, Seq(g), n)
      case Discord(ks, v) => df = Ops.discordanceFilter(df, ks, v)
      case Binarize(v, g) => df = Ops.binarizeByMedian(df, v, g)
    }
    df.groupBy(col(p.outKey))
      .agg(count(lit(1)).as("n"), sum(col(p.sumCol)).as("s"))
      .collect()
      .map(r => norm(r.get(0)) -> (r.getLong(1), toD(r.get(2))))
      .toMap
  }

  private def runOracle(p: OpsPlan): Map[Any, (Long, Double)] = {
    var data: Seq[Map[String, Any]] = rows(p.base)
    p.salted.foreach { dim =>
      val right = dimRows(dim.table)
      val byKey = right.groupBy(r => norm(r(dim.rk)))
      data = data.flatMap { l =>
        byKey.getOrElse(norm(l(dim.lk)), Nil)
          .map(r => l ++ (r - dim.rk))
      }
    }
    p.steps.foreach {
      case Support(g, n) =>
        val sizes = data.groupBy(r => norm(r(g))).map { case (k, v) =>
          k -> v.size }
        data = data.filter(r => sizes(norm(r(g))) >= n)
      case Discord(ks, v) =>
        val ok = data.groupBy(r => ks.map(k => norm(r(k))))
          .filter { case (_, grp) =>
            val nn = grp.map(_(v)).filter(_ != null)
            nn.nonEmpty &&
              cmp(nn.reduce((a, b) => if (cmp(a, b) <= 0) a else b),
                nn.reduce((a, b) => if (cmp(a, b) >= 0) a else b)) == 0
          }.keySet
        data = data.filter(r => ok.contains(ks.map(k => norm(r(k)))))
      case Binarize(v, g) =>
        val med = data.groupBy(r => norm(r(g))).map { case (k, grp) =>
          k -> median(grp.map(_(v)).filter(_ != null).map(toD)) }
        data = data.map { r =>
          val m = med(norm(r(g)))
          val pos = m.exists(mv => r(v) != null && toD(r(v)) >= mv)
          r + ("value" -> (if (pos) "positive" else "negative"))
        }
    }
    data.groupBy(r => norm(r(p.outKey))).map { case (k, grp) =>
      k -> (grp.size.toLong, grp.map(r => toD(r(p.sumCol))).sum)
    }
  }

  test("120 generated Ops-composition plans agree with the oracle") {
    val rnd = new scala.util.Random(4242)
    (1 to 120).foreach { i =>
      val p = gen(rnd)
      val got = runSpark(p)
      val want = runOracle(p)
      assert(got == want,
        s"plan $i diverged: $p\nspark=${got.toSeq.sortBy(_._1.toString)}\n" +
          s"oracle=${want.toSeq.sortBy(_._1.toString)}")
    }
  }

  test("30 generated range-join plans agree with a nested-loop oracle") {
    val rnd = new scala.util.Random(777)
    val li = frames("lineitem")
    val liRows = rows("lineitem")
    (1 to 30).foreach { i =>
      // intervals per returnflag over the integer partkey domain
      val keys = liRows.map(r => r("l_returnflag")).distinct
      val maxPk = liRows.map(r => toD(r("l_partkey"))).max.toLong
      val ivs = keys.flatMap { k =>
        (0 until (1 + rnd.nextInt(3))).map { j =>
          val a = rnd.nextLong(maxPk + 1)
          val b = math.min(maxPk, a + 1 + rnd.nextLong(maxPk / 4 + 1))
          (s"$k-$j", k.toString, a, b)
        }
      }
      val ivDf = spark.createDataFrame(
        spark.sparkContext.parallelize(ivs.map(t =>
          org.apache.spark.sql.Row(t._1, t._2, t._3, t._4)), 2),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("iv_id",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("l_returnflag",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("iv_start",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("iv_end",
            org.apache.spark.sql.types.LongType))))
      val binWidth = Seq(16L, 64L, 256L, 1024L)(rnd.nextInt(4))
      val got = Ops.rangeJoin(li.select(col("l_returnflag"),
          col("l_partkey").cast("long").as("pk")),
          ivDf, "l_returnflag", "pk", "iv_start", "iv_end", binWidth)
        .groupBy(col("iv_id")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val want = ivs.map { case (id, k, a, b) =>
        id -> liRows.count(r => r("l_returnflag") == k && {
          val pk = toD(r("l_partkey")).toLong; pk >= a && pk <= b
        }).toLong
      }.filter(_._2 > 0).toMap
      assert(got == want, s"range plan $i (binWidth=$binWidth) diverged")
    }
  }
}
