package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differential fuzzing of the relational core: generated
  * filter ∘ join ∘ aggregate plans — inner AND left-outer joins,
  * HAVING-style group filters, and two-level (agg-of-agg) shapes — run
  * through Spark AND through an independent in-memory evaluator (plain
  * Scala collections over the same rows), and every result must agree
  * exactly. This extends the hand-written DuckDB oracles with
  * machine-generated ones — the DuckDB binary isn't loadable in-JVM,
  * so the second implementation here IS the oracle (it shares no code
  * with Spark's evaluation).
  *
  * Determinism contract: fixed seed, predicate literals drawn from real
  * column values, SUM restricted to integral-valued columns (integral
  * sums below 2^53 are exact in ANY addition order, so the two engines
  * can't drift by float associativity), timestamps excluded, ASCII-only
  * string ordering (matches UTF8String binary order on this data).
  */
class DifferentialFuzzSpec extends SparkSpec {
  import graft.Tables

  private case class Pred(col: String, op: String, lit: Any)
  private case class Join(table: String, leftKey: String, rightKey: String)
  private case class Agg(kind: String, col: String) // kind: count|sum|min|max
  // joins: a CHAIN of up to two (join, type) steps — the second step may
  // hang off the first joined table (lineitem→supplier→nation), each
  // independently inner or left-outer; having: min group size (HAVING
  // count(*) >= n); second: optional second aggregation level over the
  // grouped result (count|sum|min|max over the level-1 agg value) — the
  // "agg of agg" shape (e.g. Q13's distribution-of-counts)
  private case class Plan(base: String, preds: Seq[Pred],
      joins: Seq[(Join, String)], groupCol: Option[String], agg: Agg,
      having: Option[Int], second: Option[String])

  private val d = sf() // sf0.001: small enough for the in-memory oracle

  private lazy val frames: Map[String, DataFrame] = Map(
    "nation" -> Tables.nation(spark, d),
    "customer" -> Tables.customer(spark, d),
    "orders" -> Tables.orders(spark, d),
    "supplier" -> Tables.supplier(spark, d),
    "part" -> Tables.part(spark, d),
    "lineitem" -> Tables.lineitem(spark, d))

  private lazy val rows: Map[String, Seq[Map[String, Any]]] =
    frames.map { case (n, df) =>
      val cols = df.columns
      n -> df.collect().toSeq.map(r =>
        cols.zipWithIndex.map { case (c, i) => c -> r.get(i) }.toMap)
    }

  // per-table fuzzable columns (timestamps excluded by omission)
  private val predCols = Map(
    "nation" -> Seq("n_nationkey", "n_name"),
    "customer" -> Seq("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "orders" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderpriority"),
    "supplier" -> Seq("s_suppkey", "s_nationkey", "s_acctbal"),
    "part" -> Seq("p_partkey", "p_brand", "p_size", "p_retailprice"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
      "l_returnflag", "l_linestatus"))
  private val groupCols = Map(
    "nation" -> Seq("n_name"),
    "customer" -> Seq("c_nationkey", "c_mktsegment"),
    "orders" -> Seq("o_orderstatus", "o_orderpriority"),
    "supplier" -> Seq("s_nationkey"),
    "part" -> Seq("p_brand", "p_size"),
    "lineitem" -> Seq("l_returnflag", "l_linestatus", "l_linenumber"))
  // SUM only over integral-valued columns (exact in double at this size)
  private val sumCols = Map(
    "nation" -> Seq("n_nationkey"),
    "customer" -> Seq("c_custkey", "c_nationkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "supplier" -> Seq("s_suppkey", "s_nationkey"),
    "part" -> Seq("p_partkey", "p_size"),
    "lineitem" -> Seq("l_quantity", "l_linenumber", "l_partkey"))
  private val minMaxCols = Map(
    "nation" -> Seq("n_nationkey", "n_name"),
    "customer" -> Seq("c_acctbal", "c_custkey", "c_mktsegment"),
    "orders" -> Seq("o_totalprice", "o_orderkey", "o_orderpriority"),
    "supplier" -> Seq("s_acctbal", "s_suppkey"),
    "part" -> Seq("p_retailprice", "p_size", "p_brand"),
    "lineitem" -> Seq("l_quantity", "l_extendedprice", "l_returnflag"))
  private val joinsFor = Map(
    "customer" -> Seq(Join("orders", "c_custkey", "o_custkey"),
      Join("nation", "c_nationkey", "n_nationkey")),
    "orders" -> Seq(Join("customer", "o_custkey", "c_custkey")),
    "supplier" -> Seq(Join("nation", "s_nationkey", "n_nationkey")),
    "lineitem" -> Seq(Join("part", "l_partkey", "p_partkey"),
      Join("supplier", "l_suppkey", "s_suppkey")),
    "part" -> Seq.empty[Join],
    "nation" -> Seq.empty[Join])

  private def gen(rnd: scala.util.Random): Plan = {
    val base = predCols.keys.toSeq.sorted.apply(rnd.nextInt(predCols.size))
    val preds = (0 until rnd.nextInt(3)).map { _ =>
      val c = predCols(base)(rnd.nextInt(predCols(base).size))
      val sample = rows(base)(rnd.nextInt(rows(base).size))(c)
      val op = sample match {
        case _: String if rnd.nextBoolean() => Seq("=", "!=")(rnd.nextInt(2))
        case _ => Seq("<", "<=", ">", ">=", "=", "!=")(rnd.nextInt(6))
      }
      Pred(c, op, sample)
    }
    val j1opts = joinsFor(base)
    val joins = scala.collection.mutable.ArrayBuffer.empty[(Join, String)]
    if (j1opts.nonEmpty && rnd.nextBoolean()) {
      val j1 = j1opts(rnd.nextInt(j1opts.size))
      // semi/anti joins filter the left side without exposing right
      // columns — they join (pun intended) the grammar with lower
      // weight than the column-producing types
      val typ1 = rnd.nextInt(5) match {
        case 0 | 1 => "inner"
        case 2 => "left"
        case 3 => "left_semi"
        case _ => "left_anti"
      }
      joins += ((j1, typ1))
      // a second step: another dim off the base, or a chain off the
      // first joined table — never a table already in the plan (a
      // repeated table would collide column names), and never chained
      // off a semi/anti step (its columns don't exist downstream)
      val chainable = typ1 == "inner" || typ1 == "left"
      val j2opts = (j1opts.filterNot(_ == j1) ++
          (if (chainable) joinsFor(j1.table) else Seq.empty))
        .filterNot(j => j.table == base || j.table == j1.table)
      if (j2opts.nonEmpty && rnd.nextInt(3) == 0) {
        val j2 = j2opts(rnd.nextInt(j2opts.size))
        joins += ((j2, if (rnd.nextBoolean()) "left" else "inner"))
      }
    }
    // group/agg columns may come from the base or any COLUMN-PRODUCING
    // joined table (semi/anti contribute no columns)
    val tabs = base +: joins.collect {
      case (j, t) if t == "inner" || t == "left" => j.table
    }.toSeq
    val gtab = tabs(rnd.nextInt(tabs.size))
    val groupCol =
      if (rnd.nextBoolean())
        Some(groupCols(gtab)(rnd.nextInt(groupCols(gtab).size)))
      else None
    val atab = tabs(rnd.nextInt(tabs.size))
    val agg = rnd.nextInt(4) match {
      case 0 => Agg("count", "*")
      case 1 => Agg("sum", sumCols(atab)(rnd.nextInt(sumCols(atab).size)))
      case 2 => Agg("min", minMaxCols(atab)(rnd.nextInt(minMaxCols(atab).size)))
      case _ => Agg("max", minMaxCols(atab)(rnd.nextInt(minMaxCols(atab).size)))
    }
    val having =
      if (groupCol.isDefined && rnd.nextInt(3) == 0)
        Some(1 + rnd.nextInt(4))
      else None
    // level-2 SUM only over integral level-1 values (count/sum over
    // integral cols): summing fractional min/max values across groups
    // would reintroduce float-order drift
    val secondOps =
      if (agg.kind == "count" || agg.kind == "sum")
        Seq("count", "sum", "min", "max")
      else Seq("count", "min", "max")
    val second =
      if (groupCol.isDefined && rnd.nextInt(3) == 0)
        Some(secondOps(rnd.nextInt(secondOps.size)))
      else None
    Plan(base, preds, joins.toSeq, groupCol, agg, having, second)
  }

  // ---- Spark side -------------------------------------------------------
  private def sparkEval(p: Plan): Map[Any, Any] = {
    def cond(pr: Pred): Column = pr.op match {
      case "<" => col(pr.col) < lit(pr.lit)
      case "<=" => col(pr.col) <= lit(pr.lit)
      case ">" => col(pr.col) > lit(pr.lit)
      case ">=" => col(pr.col) >= lit(pr.lit)
      case "=" => col(pr.col) === lit(pr.lit)
      case _ => col(pr.col) =!= lit(pr.lit)
    }
    var df = p.preds.foldLeft(frames(p.base))((f, pr) => f.filter(cond(pr)))
    p.joins.foreach { case (j, typ) =>
      df = df.join(frames(j.table), col(j.leftKey) === col(j.rightKey), typ)
    }
    val aggCol = p.agg.kind match {
      case "count" => count(lit(1))
      case "sum" => sum(col(p.agg.col))
      case "min" => min(col(p.agg.col))
      case "max" => max(col(p.agg.col))
    }
    val res = p.groupCol match {
      case Some(g) =>
        var adf = df.groupBy(col(g))
          .agg(aggCol.as("a"), count(lit(1)).as("__n"))
        p.having.foreach(n => adf = adf.filter(col("__n") >= n))
        p.second match {
          case Some(k2) =>
            val c2 = k2 match {
              case "count" => count(lit(1))
              case "sum" => sum(col("a"))
              case "min" => min(col("a"))
              case "max" => max(col("a"))
            }
            adf.agg(c2.as("a2"))
              .collect().map(r => ("<global2>": Any, norm(r.get(0))))
          case None =>
            adf.select(col(g), col("a"))
              .collect().map(r => (norm(r.get(0)), norm(r.get(1))))
        }
      case None => df.agg(aggCol.as("a"))
        .collect().map(r => ("<global>": Any, norm(r.get(0))))
    }
    res.toMap
  }

  // ---- independent in-memory oracle ------------------------------------
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: String, y: String) => x.compareTo(y)
    case (x, y) => java.lang.Double.compare(toD(x), toD(y))
  }
  private def toD(a: Any): Double = a match {
    case x: Long => x.toDouble
    case x: Int => x.toDouble
    case x: Double => x
    case x: java.math.BigDecimal => x.doubleValue()
    case _ => Double.NaN
  }
  private def norm(a: Any): Any = a match {
    case x: Int => x.toLong
    case x: java.math.BigDecimal => x.doubleValue()
    case x => x
  }

  private def refEval(p: Plan): Map[Any, Any] = {
    def keep(r: Map[String, Any], pr: Pred): Boolean = {
      val v = r(pr.col)
      if (v == null || pr.lit == null) false
      else pr.op match {
        case "<" => cmp(v, pr.lit) < 0
        case "<=" => cmp(v, pr.lit) <= 0
        case ">" => cmp(v, pr.lit) > 0
        case ">=" => cmp(v, pr.lit) >= 0
        case "=" => cmp(v, pr.lit) == 0
        case _ => cmp(v, pr.lit) != 0
      }
    }
    var data = rows(p.base).filter(r => p.preds.forall(keep(r, _)))
    p.joins.foreach { case (j, typ) =>
      val right = rows(j.table).groupBy(r => r(j.rightKey))
      val nullRight =
        frames(j.table).columns.map(c => c -> (null: Any)).toMap
      data = typ match {
        // semi/anti: existence filters — no multiplicity, no columns
        case "left_semi" => data.filter(l =>
          l(j.leftKey) != null && right.contains(l(j.leftKey)))
        case "left_anti" => data.filter(l =>
          l(j.leftKey) == null || !right.contains(l(j.leftKey)))
        case _ => data.flatMap { l =>
          // a null leftKey (from an earlier left join's padding) matches
          // nothing — null never equals — so it drops (inner) or pads (left)
          (if (l(j.leftKey) == null) None else right.get(l(j.leftKey))) match {
            case Some(ms) => ms.map(r => l ++ r)
            case None if typ == "left" => Seq(l ++ nullRight)
            case None => Seq.empty
          }
        }
      }
    }
    def aggOf(group: Seq[Map[String, Any]]): Any = p.agg.kind match {
      case "count" => group.size.toLong
      case "sum" =>
        val vs = group.map(r => r(p.agg.col)).filter(_ != null)
        if (vs.isEmpty) null
        else vs.head match {
          case _: Long | _: Int => vs.map(v => toD(v).toLong).sum: Any
          case _ => vs.map(toD).sum: Any
        }
      case "min" =>
        val vs = group.map(r => r(p.agg.col)).filter(_ != null)
        if (vs.isEmpty) null else vs.reduce((a, b) => if (cmp(a, b) <= 0) a else b)
      case _ =>
        val vs = group.map(r => r(p.agg.col)).filter(_ != null)
        if (vs.isEmpty) null else vs.reduce((a, b) => if (cmp(a, b) >= 0) a else b)
    }
    p.groupCol match {
      case Some(g) =>
        val groups = data.groupBy(r => norm(r(g)))
          .filter { case (_, grp) =>
            p.having.forall(n => grp.size >= n) }
          .map { case (k, grp) => k -> norm(aggOf(grp.toSeq)) }
        p.second match {
          case Some(k2) =>
            val vs = groups.values.toSeq
            val nn = vs.filter(_ != null)
            val v2: Any = k2 match {
              case "count" => vs.size.toLong // count(lit(1)): nulls too
              case "sum" =>
                if (nn.isEmpty) null
                else nn.head match {
                  case _: Long => nn.map(v => toD(v).toLong).sum: Any
                  case _ => nn.map(toD).sum: Any
                }
              case "min" =>
                if (nn.isEmpty) null
                else nn.reduce((a, b) => if (cmp(a, b) <= 0) a else b)
              case _ =>
                if (nn.isEmpty) null
                else nn.reduce((a, b) => if (cmp(a, b) >= 0) a else b)
            }
            Map(("<global2>": Any) -> norm(v2))
          case None => groups
        }
      case None => Map(("<global>": Any) -> norm(aggOf(data)))
    }
  }

  // ---- window-function family ------------------------------------------
  // filter → window over a partition → threshold filter on the window
  // value → global (count, sum of window value). Covers row_number /
  // rank / dense_rank (ranking semantics incl. ties) and count/sum OVER
  // a partition (the grouped-mutate shape). The final aggregate keeps
  // the compare single-row while still pinning every row's window value
  // (the sum is a checksum of the full assignment).
  //
  // Determinism: row_number gets the table's unique key appended to the
  // ordering (total order); rank/dense_rank order by the value alone —
  // tie GROUPS are deterministic even though row order isn't. Sums stay
  // integral (ranks are ints; sum-over-partition draws from sumCols).
  private case class WinPlan(base: String, preds: Seq[Pred], part: String,
      ord: String, desc: Boolean, func: String, sumCol: String, k: Long)

  private val uniqueKey = Map(
    "nation" -> Seq("n_nationkey"), "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey"), "supplier" -> Seq("s_suppkey"),
    "part" -> Seq("p_partkey"),
    "lineitem" -> Seq("l_orderkey", "l_linenumber"))

  private def genWin(rnd: scala.util.Random): WinPlan = {
    val base = predCols.keys.toSeq.sorted.apply(rnd.nextInt(predCols.size))
    val preds = (0 until rnd.nextInt(2)).map { _ =>
      val c = predCols(base)(rnd.nextInt(predCols(base).size))
      val sample = rows(base)(rnd.nextInt(rows(base).size))(c)
      val op = sample match {
        case _: String => Seq("=", "!=")(rnd.nextInt(2))
        case _ => Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
      }
      Pred(c, op, sample)
    }
    val part = groupCols(base)(rnd.nextInt(groupCols(base).size))
    val ord = minMaxCols(base)(rnd.nextInt(minMaxCols(base).size))
    val func = Seq("row_number", "rank", "dense_rank", "count_part",
      "sum_part")(rnd.nextInt(5))
    val sumCol = sumCols(base)(rnd.nextInt(sumCols(base).size))
    val k = func match {
      case "row_number" | "rank" | "dense_rank" => 1L + rnd.nextInt(5)
      case _ =>
        // a real partition's value keeps the >= cut selective: sample a
        // row, measure its partition (generation may peek at the data;
        // both engines still evaluate independently)
        val anchor = rows(base)(rnd.nextInt(rows(base).size))(part)
        val grp = rows(base).filter(r => norm(r(part)) == norm(anchor))
        if (func == "count_part") grp.size.toLong
        else grp.map(r => toD(r(sumCol))).sum.toLong
    }
    WinPlan(base, preds, part, ord, rnd.nextBoolean(), func, sumCol, k)
  }

  private def sparkEvalWin(p: WinPlan): (Long, Any) = {
    import org.apache.spark.sql.expressions.Window
    def cond(pr: Pred): Column = pr.op match {
      case "<" => col(pr.col) < lit(pr.lit)
      case "<=" => col(pr.col) <= lit(pr.lit)
      case ">" => col(pr.col) > lit(pr.lit)
      case ">=" => col(pr.col) >= lit(pr.lit)
      case "=" => col(pr.col) === lit(pr.lit)
      case _ => col(pr.col) =!= lit(pr.lit)
    }
    val df = p.preds.foldLeft(frames(p.base))((f, pr) => f.filter(cond(pr)))
    def dir(c: Column): Column = if (p.desc) c.desc else c.asc
    val wv = p.func match {
      case "row_number" =>
        val keys = (p.ord +: uniqueKey(p.base).filterNot(_ == p.ord))
          .map(c => dir(col(c)))
        row_number().over(Window.partitionBy(col(p.part)).orderBy(keys: _*))
      case "rank" =>
        rank().over(Window.partitionBy(col(p.part)).orderBy(dir(col(p.ord))))
      case "dense_rank" =>
        dense_rank().over(
          Window.partitionBy(col(p.part)).orderBy(dir(col(p.ord))))
      case "count_part" =>
        count(lit(1)).over(Window.partitionBy(col(p.part)))
      case _ =>
        sum(col(p.sumCol)).over(Window.partitionBy(col(p.part)))
    }
    val cut = if (p.func == "count_part" || p.func == "sum_part")
      col("wv") >= lit(p.k) else col("wv") <= lit(p.k)
    val r = df.withColumn("wv", wv).filter(cut)
      .agg(count(lit(1)).as("n"), sum(col("wv")).as("s"))
      .collect().head
    (r.getLong(0), norm(r.get(1)))
  }

  private def refEvalWin(p: WinPlan): (Long, Any) = {
    def keep(r: Map[String, Any], pr: Pred): Boolean = {
      val v = r(pr.col)
      if (v == null || pr.lit == null) false
      else pr.op match {
        case "<" => cmp(v, pr.lit) < 0
        case "<=" => cmp(v, pr.lit) <= 0
        case ">" => cmp(v, pr.lit) > 0
        case ">=" => cmp(v, pr.lit) >= 0
        case "=" => cmp(v, pr.lit) == 0
        case _ => cmp(v, pr.lit) != 0
      }
    }
    val data = rows(p.base).filter(r => p.preds.forall(keep(r, _)))
    val sign = if (p.desc) -1 else 1
    def keyCmp(keys: Seq[String])(a: Map[String, Any],
        b: Map[String, Any]): Boolean = {
      val c = keys.iterator.map(k => sign * cmp(a(k), b(k)))
        .find(_ != 0).getOrElse(0)
      c < 0
    }
    val withWv: Seq[(Map[String, Any], Any)] =
      data.groupBy(r => norm(r(p.part))).toSeq.flatMap { case (_, grp) =>
        p.func match {
          case "row_number" =>
            val keys = p.ord +: uniqueKey(p.base).filterNot(_ == p.ord)
            grp.sortWith(keyCmp(keys)).zipWithIndex
              .map { case (r, i) => r -> ((i + 1).toLong: Any) }
          case "rank" =>
            val sorted = grp.sortWith(keyCmp(Seq(p.ord)))
            var last: Any = null
            var lastRank = 0L
            sorted.zipWithIndex.map { case (r, i) =>
              if (last == null || cmp(r(p.ord), last) != 0) {
                lastRank = i + 1L; last = r(p.ord)
              }
              r -> (lastRank: Any)
            }
          case "dense_rank" =>
            val sorted = grp.sortWith(keyCmp(Seq(p.ord)))
            var last: Any = null
            var dr = 0L
            sorted.map { r =>
              if (last == null || cmp(r(p.ord), last) != 0) {
                dr += 1; last = r(p.ord)
              }
              r -> (dr: Any)
            }
          case "count_part" => grp.map(r => r -> (grp.size.toLong: Any))
          case _ =>
            val vs = grp.map(r => r(p.sumCol)).filter(_ != null)
            val s: Any =
              if (vs.isEmpty) null
              else vs.head match {
                case _: Long | _: Int => vs.map(v => toD(v).toLong).sum: Any
                case _ => vs.map(toD).sum: Any
              }
            grp.map(r => r -> s)
        }
      }
    val kept = withWv.filter { case (_, wv) =>
      wv != null && (if (p.func == "count_part" || p.func == "sum_part")
        cmp(wv, p.k) >= 0 else cmp(wv, p.k) <= 0)
    }
    val wvs = kept.map(_._2)
    val s: Any =
      if (wvs.isEmpty) null
      else wvs.head match {
        case _: Long => wvs.map(v => toD(v).toLong).sum: Any
        case _ => wvs.map(toD).sum: Any
      }
    (kept.size.toLong, norm(s))
  }

  test("200 generated filter∘join∘agg plans agree with the independent oracle") {
    val rnd = new scala.util.Random(20260813L)
    var withJoin = 0
    var leftJoin = 0
    var semiAnti = 0
    var chains = 0
    var grouped = 0
    var havings = 0
    var twoLevel = 0
    (1 to 200).foreach { i =>
      val p = gen(rnd)
      if (p.joins.nonEmpty) withJoin += 1
      if (p.joins.exists(_._2 == "left")) leftJoin += 1
      if (p.joins.exists(t => t._2 == "left_semi" || t._2 == "left_anti"))
        semiAnti += 1
      if (p.joins.size == 2) chains += 1
      if (p.groupCol.isDefined) grouped += 1
      if (p.having.isDefined) havings += 1
      if (p.second.isDefined) twoLevel += 1
      val got = sparkEval(p)
      val want = refEval(p)
      assert(got == want,
        s"plan #$i diverged: $p\nspark=$got\noracle=$want")
    }
    // the generator actually exercises the composition space
    assert(withJoin > 40 && leftJoin > 8 && semiAnti > 15 && chains > 8 &&
      grouped > 60 && havings > 15 && twoLevel > 15,
      s"join=$withJoin left=$leftJoin semiAnti=$semiAnti chains=$chains " +
        s"grouped=$grouped having=$havings second=$twoLevel")
  }

  // ---- union family -----------------------------------------------------
  // two predicate slices of the same table, UNION ALL or union-DISTINCT
  // (full-row dedup), then the usual group/agg. Pins bag vs set union
  // semantics — the operator pair behind u1/u2/u3 — under generated
  // predicates.
  private case class UnionPlan(base: String, predsA: Seq[Pred],
      predsB: Seq[Pred], distinct: Boolean, groupCol: Option[String],
      agg: Agg)

  private def genUnion(rnd: scala.util.Random): UnionPlan = {
    val base = predCols.keys.toSeq.sorted.apply(rnd.nextInt(predCols.size))
    def preds(): Seq[Pred] = (0 until 1 + rnd.nextInt(2)).map { _ =>
      val c = predCols(base)(rnd.nextInt(predCols(base).size))
      val sample = rows(base)(rnd.nextInt(rows(base).size))(c)
      val op = sample match {
        case _: String => Seq("=", "!=")(rnd.nextInt(2))
        case _ => Seq("<", "<=", ">", ">=")(rnd.nextInt(4))
      }
      Pred(c, op, sample)
    }
    val groupCol =
      if (rnd.nextBoolean())
        Some(groupCols(base)(rnd.nextInt(groupCols(base).size)))
      else None
    val agg = rnd.nextInt(4) match {
      case 0 => Agg("count", "*")
      case 1 => Agg("sum", sumCols(base)(rnd.nextInt(sumCols(base).size)))
      case 2 => Agg("min", minMaxCols(base)(rnd.nextInt(minMaxCols(base).size)))
      case _ => Agg("max", minMaxCols(base)(rnd.nextInt(minMaxCols(base).size)))
    }
    UnionPlan(base, preds(), preds(), rnd.nextBoolean(), groupCol, agg)
  }

  private def evalUnionBoth(p: UnionPlan): (Map[Any, Any], Map[Any, Any]) = {
    def cond(pr: Pred): Column = pr.op match {
      case "<" => col(pr.col) < lit(pr.lit)
      case "<=" => col(pr.col) <= lit(pr.lit)
      case ">" => col(pr.col) > lit(pr.lit)
      case ">=" => col(pr.col) >= lit(pr.lit)
      case "=" => col(pr.col) === lit(pr.lit)
      case _ => col(pr.col) =!= lit(pr.lit)
    }
    val a = p.predsA.foldLeft(frames(p.base))((f, pr) => f.filter(cond(pr)))
    val b = p.predsB.foldLeft(frames(p.base))((f, pr) => f.filter(cond(pr)))
    val u0 = a.union(b)
    val u = if (p.distinct) u0.distinct() else u0
    val aggCol = p.agg.kind match {
      case "count" => count(lit(1))
      case "sum" => sum(col(p.agg.col))
      case "min" => min(col(p.agg.col))
      case "max" => max(col(p.agg.col))
    }
    val got: Map[Any, Any] = (p.groupCol match {
      case Some(g) => u.groupBy(col(g)).agg(aggCol.as("a"))
        .collect().map(r => (norm(r.get(0)), norm(r.get(1))))
      case None => u.agg(aggCol.as("a"))
        .collect().map(r => ("<global>": Any, norm(r.get(0))))
    }).toMap

    def keep(r: Map[String, Any], pr: Pred): Boolean = {
      val v = r(pr.col)
      if (v == null || pr.lit == null) false
      else pr.op match {
        case "<" => cmp(v, pr.lit) < 0
        case "<=" => cmp(v, pr.lit) <= 0
        case ">" => cmp(v, pr.lit) > 0
        case ">=" => cmp(v, pr.lit) >= 0
        case "=" => cmp(v, pr.lit) == 0
        case _ => cmp(v, pr.lit) != 0
      }
    }
    val ra = rows(p.base).filter(r => p.predsA.forall(keep(r, _)))
    val rb = rows(p.base).filter(r => p.predsB.forall(keep(r, _)))
    val ru0 = ra ++ rb
    val ru = if (p.distinct) ru0.distinct else ru0
    def aggOf(group: Seq[Map[String, Any]]): Any = p.agg.kind match {
      case "count" => group.size.toLong
      case "sum" =>
        val vs = group.map(r => r(p.agg.col)).filter(_ != null)
        if (vs.isEmpty) null
        else vs.head match {
          case _: Long | _: Int => vs.map(v => toD(v).toLong).sum: Any
          case _ => vs.map(toD).sum: Any
        }
      case "min" =>
        val vs = group.map(r => r(p.agg.col)).filter(_ != null)
        if (vs.isEmpty) null
        else vs.reduce((x, y) => if (cmp(x, y) <= 0) x else y)
      case _ =>
        val vs = group.map(r => r(p.agg.col)).filter(_ != null)
        if (vs.isEmpty) null
        else vs.reduce((x, y) => if (cmp(x, y) >= 0) x else y)
    }
    val want: Map[Any, Any] = p.groupCol match {
      case Some(g) =>
        rowsToGroups(ru, g).map { case (k, grp) => k -> norm(aggOf(grp)) }
      case None => Map(("<global>": Any) -> norm(aggOf(ru)))
    }
    (got, want)
  }

  private def rowsToGroups(data: Seq[Map[String, Any]], g: String)
      : Map[Any, Seq[Map[String, Any]]] =
    data.groupBy(r => norm(r(g))).map { case (k, v) => k -> v.toSeq }

  test("60 generated union plans agree with the independent oracle") {
    val rnd = new scala.util.Random(20260815L)
    var distincts = 0
    (1 to 60).foreach { i =>
      val p = genUnion(rnd)
      if (p.distinct) distincts += 1
      val (got, want) = evalUnionBoth(p)
      assert(got == want, s"union plan #$i diverged: $p\n" +
        s"spark=$got\noracle=$want")
    }
    assert(distincts > 15 && distincts < 45, s"distincts=$distincts")
  }

  test("100 generated window plans agree with the independent oracle") {
    val rnd = new scala.util.Random(20260814L)
    var byFunc = Map.empty[String, Int].withDefaultValue(0)
    var nonTrivial = 0
    (1 to 100).foreach { i =>
      val p = genWin(rnd)
      byFunc += p.func -> (byFunc(p.func) + 1)
      val got = sparkEvalWin(p)
      val want = refEvalWin(p)
      if (got._1 > 0) nonTrivial += 1
      assert(got == want, s"window plan #$i diverged: $p\n" +
        s"spark=$got\noracle=$want")
    }
    // every function fuzzed, and the threshold cuts mostly keep rows
    assert(byFunc.size == 5 && byFunc.values.forall(_ >= 10), byFunc)
    assert(nonTrivial > 70, s"only $nonTrivial plans kept any rows")
  }
}
