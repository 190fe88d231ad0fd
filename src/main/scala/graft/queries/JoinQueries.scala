package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.dsum

/** Joins — SURVEY.md §2.3 (J1-J9) plus the semi/anti pair.
  *
  * Scale notes: dimension sides (region, nation, literal lookups, the
  * distinct event-type list) are explicitly `broadcast()` so the fact scan
  * never shuffles for them; the big fact⋈fact joins (lineitem⋈orders) are
  * left to Catalyst/AQE which picks SMJ or shuffled-hash with both sides
  * partitioned on the key — the layout that survives a 1000-executor
  * scale-up. Negative synthesis (J5/J6) builds the key grid from two
  * *distinct* projections (tiny) instead of cross-joining fact rows.
  */
object JoinQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // J1: inner equi-join, single key (ref: src/80_harmonize.py:73 —
    // activities ⋈ inchi→smiles map).
    "j1_inner_equi" -> ((s, d) => {
      Tables.orders(s, d).join(Tables.customer(s, d),
          col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J2: inner equi-join on a composite key (ref: src/80_harmonize.py:78 —
    // re-keying activities on ["source","sid"]). The map side is a derived
    // per-(partkey,suppkey) aggregate joined back on both columns.
    "j2_composite_key" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val ps = li.groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("pair_qty"))
      li.join(ps, Seq("l_partkey", "l_suppkey"))
        .filter(col("n_lines") >= 2)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"), dsum(col("pair_qty")).as("sum_pair_qty"))
        .orderBy(col("l_returnflag"))
    }),

    // J3: 3-way join chain (ref: src/02_integrate_chembl.R:40 —
    // activities ⋈ assays ⋈ compounds).
    "j3_three_way" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice")).as("revenue"))
        .orderBy(col("c_mktsegment"))
    }),

    // J4: left outer join, preserving unmatched left rows as zeros
    // (ref: src/07_integrate_ctdbase.R:37).
    "j4_left_outer" -> ((s, d) => {
      val perCust = Tables.orders(s, d).groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"))
      Tables.customer(s, d)
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(col("c_custkey"), col("c_mktsegment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("c_custkey"))
    }),

    // J5 + J6: negative synthesis — cross-join the distinct key dims, left
    // join observed facts, null ⇒ "negative" (ref: src/06_integrate_ice.R:
    // 102-105). The grid is built from distinct projections (small), with
    // the 5-row event_type dim broadcast.
    "j5_negative_synthesis" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val users = ev.select(col("user_id")).distinct()
      val types = ev.select(col("event_type")).distinct()
      val observed = ev.groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("n"))
      users.crossJoin(broadcast(types))
        .join(observed, Seq("user_id", "event_type"), "left")
        .withColumn("label",
          when(col("n").isNull, "negative").otherwise("positive"))
        .groupBy(col("event_type"), col("label"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy(col("event_type"), col("label"))
    }),

    // J6: plain cross join of two dims (ref: src/06_integrate_ice.R:102,
    // expand.grid).
    "j6_cross_join" -> ((s, d) => {
      Tables.nation(s, d).crossJoin(broadcast(Tables.region(s, d)))
        .select(col("n_name"), col("r_name"))
        .orderBy(col("n_name"), col("r_name"))
    }),

    // J7: broadcast lookup join chain through two small dims
    // (ref: src/05_integrate_reach.R:13 — 111-row GHS lookup).
    "j7_broadcast_lookup" -> ((s, d) => {
      Tables.supplier(s, d)
        .join(broadcast(Tables.nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(count(lit(1)).as("n_suppliers"))
        .orderBy(col("r_name"))
    }),

    // J8: left-semi join — keep customers having a qualifying order
    // (ref: src/91_property_categories.py:24).
    "j8_semi_join" -> ((s, d) => {
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 250000)
      Tables.customer(s, d)
        .join(big, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J8b: left-anti join — the complement (reference's closest form is the
    // J5 null-fill; anti completes the engine's join surface).
    // Anti against a FILTERED right side (customers with no urgent
    // order): every customer has SOME order in the testdata, so the
    // unfiltered anti is vacuously empty at every sf — the priority
    // slice keeps the result non-empty (and non-total) at every sf,
    // which is what makes the oracle row actually prove anti semantics.
    "j8_anti_join" -> ((s, d) => {
      Tables.customer(s, d)
        .join(Tables.orders(s, d)
            .filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // J9: join-as-existence-check assertion shape — a single global count
    // (ref: src/09_integrate_pubchem.py:79-82).
    "j9_join_count" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(count(lit(1)).as("n_matched"))
    }),

    // As-of join (no Spark builtin — composed per Ops.asOfJoin): each
    // event picks up the user's most recent order at or before the event
    // time. Oracle: DuckDB's native ASOF LEFT JOIN.
    "j10_asof_join" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"),
          col("o_orderdate").as("ts"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.operators.Ops.asOfJoin(ev, r, "user_id", "ts")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(col("asof_o_orderkey")).as("n_matched"),
          countDistinct(col("asof_o_orderkey")).as("n_orders"))
        .orderBy(col("event_type"))
    }),

    // Native as-of join — the custom LogicalPlan+Strategy+SparkPlan
    // sorted-merge operator (graft.plans.AsOfJoinNative); same oracle as
    // j10 proves both as-of implementations and DuckDB agree.
    "j12_native_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      val r = Tables.orders(s, d)
        .groupBy(col("o_custkey").as("user_id"),
          col("o_orderdate").as("ts"))
        .agg(max(col("o_orderkey")).as("o_orderkey"))
      graft.plans.AsOf.asOfJoinNative(ev, r, "user_id", "ts")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count(col("o_orderkey")).as("n_matched"),
          countDistinct(col("o_orderkey")).as("n_orders"))
        .orderBy(col("event_type"))
    }),

    // Salted skew-guard join — row-identical to the plain join (the
    // oracle is the unsalted SQL), hot keys spread across 8 sub-keys.
    "j11_salted_join" -> ((s, d) => {
      graft.operators.Ops.saltedJoin(
          Tables.orders(s, d), Tables.customer(s, d)
            .withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey", "o_orderkey", 8)
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          countDistinct(col("o_custkey")).as("n_custs"))
        .orderBy(col("c_mktsegment"))
    }),

    // Range join (no Spark builtin for key + range without a post-filter
    // nested loop — Ops.rangeJoin bins time into an equi-join): for each
    // anchor order, the same customer's follow-up orders within 30 days
    // after it. Bin width DERIVED from the interval-span distribution
    // (Ops.derivedBinWidth — median span, here 30 days; the hand-tuned
    // 7-day value it replaces was a caller-picked knob the data never
    // validated, VERDICT r11 #6). Exclusive start via +1s (integer
    // second domain).
    "j13_range_join" -> ((s, d) => {
      val day = 86400L
      val o = Tables.orders(s, d).select(col("o_custkey"),
        col("o_orderkey"), col("o_orderdate").cast("timestamp").cast("long").as("sec"))
      val points = o.select(col("o_custkey"), col("o_orderkey"), col("sec"))
      val anchors = o.select(col("o_custkey"),
        col("o_orderkey").as("anchor_key"),
        (col("sec") + 1).as("start"), (col("sec") + 30 * day).as("end"))
      graft.operators.Ops.rangeJoin(points, anchors, "o_custkey",
          "sec", "start", "end")
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("anchor_key")).as("n_anchors_with_follower"),
          countDistinct(col("o_orderkey")).as("n_followers"))
    }),

    // Fuzzy (edit-distance) join with multi-pass token blocking — the
    // entity-resolution shape: candidates come from TWO equi-join
    // passes (block on first token, block on last token — a single-token
    // typo always survives one of them), distinct-ed, then the exact
    // levenshtein threshold filters. Never a cross join: at scale both
    // blocking passes are hash joins on a token key, and candidates ≪
    // |A|×|B|. One probe ("purple elephant") has no block-mate by
    // construction and must vanish.
    "j14_fuzzy_join" -> ((s, d) => {
      import s.implicits._
      val probes = Seq("smal ring", "red widgit", "blu bolt", "hot gearr",
        "purple elephant").toDF("probe")
        .withColumn("ptoks", split(col("probe"), " "))
      val names = Tables.part(s, d).select(col("p_name")).distinct()
        .withColumn("ntoks", split(col("p_name"), " "))
      val byFirst = probes.join(names, expr("ptoks[0] = ntoks[0]"))
      val byLast = probes.join(names,
        expr("element_at(ptoks, -1) = element_at(ntoks, -1)"))
      byFirst.unionByName(byLast)
        .select(col("probe"), col("p_name")).distinct()
        .withColumn("dist", levenshtein(col("probe"), col("p_name")))
        .filter(col("dist") <= 2)
        .orderBy(col("probe"), col("dist"), col("p_name"))
    }),

    // Referential-integrity audit — the FK health census a warehouse
    // runs before trusting a join: orphans (children whose parent key
    // is missing) via anti joins in the child→parent direction, and
    // childless parents via anti joins the other way. Each count is an
    // independent anti join — the parent key side is a narrow distinct
    // projection Catalyst can broadcast when small or shuffle on the
    // key when not; nothing materializes beyond four 1-row frames.
    "j15_fk_audit" -> ((s, d) => {
      val li = Tables.lineitem(s, d).select(col("l_orderkey"))
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"))
      val cust = Tables.customer(s, d).select(col("c_custkey"))
      val a = li.join(ord, col("l_orderkey") === col("o_orderkey"),
        "left_anti").agg(count(lit(1)).as("orphan_lineitems"))
      val b = ord.join(cust, col("o_custkey") === col("c_custkey"),
        "left_anti").agg(count(lit(1)).as("orphan_orders"))
      val c = cust.join(ord, col("c_custkey") === col("o_custkey"),
        "left_anti").agg(count(lit(1)).as("childless_customers"))
      val e = ord.join(li, col("o_orderkey") === col("l_orderkey"),
        "left_anti").agg(count(lit(1)).as("childless_orders"))
      a.crossJoin(b).crossJoin(c).crossJoin(e)
    }),

    // Interval-OVERLAP join (interval×interval, j13's point×interval
    // sibling): per customer, order pairs whose [orderdate, orderdate +
    // orderkey%20+1 days] windows intersect. Spark-first shape is
    // Ops.intervalOverlapJoin — both sides bin-exploded, equi-join on
    // (cust, bin), exact overlap residual, first-shared-bin dedupe (no
    // distinct pass) — because an inequality-only join condition can
    // only execute as a nested loop. Sum of pairwise overlap seconds is
    // integer-exact. Bin width derived from the pooled span
    // distribution of both sides (median ≈ 10.5 days here) instead of
    // a caller-picked constant (VERDICT r11 #6).
    "j16_interval_overlap" -> ((s, d) => {
      val day = 86400L
      val o = Tables.orders(s, d).select(col("o_custkey"),
          col("o_orderkey"),
          col("o_orderdate").cast("timestamp").cast("long").as("start"))
        .withColumn("end",
          col("start") + (col("o_orderkey") % 20 + 1) * day)
      val a = o.select(col("o_custkey"), col("o_orderkey").as("ka"),
        col("start").as("sa"), col("end").as("ea"))
      val b = o.select(col("o_custkey"), col("o_orderkey").as("kb"),
        col("start").as("sb"), col("end").as("eb"))
      graft.operators.Ops.intervalOverlapJoin(a, b, "o_custkey",
          "sa", "ea", "sb", "eb")
        .filter(col("ka") < col("kb"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("o_custkey")).as("n_custs"),
          sum(least(col("ea"), col("eb")) -
            greatest(col("sa"), col("sb"))).cast("long")
            .as("sum_overlap_sec"))
    })
  )

  val oracle: Map[String, String] = Map(
    "j1_inner_equi" ->
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderkey""".stripMargin,

    "j2_composite_key" ->
      """WITH ps AS (
        |  SELECT l_partkey, l_suppkey, count(*) AS n_lines,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS pair_qty
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag, count(*) AS n,
        |  CAST(SUM(CAST(pair_qty AS DECIMAL(18,4))) AS DOUBLE) AS sum_pair_qty
        |FROM lineitem JOIN ps USING (l_partkey, l_suppkey)
        |WHERE n_lines >= 2 GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "j3_three_way" ->
      """SELECT c_mktsegment, count(*) AS n_lines,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "j4_left_outer" ->
      """SELECT c_custkey, c_mktsegment,
        |  coalesce(n_orders, 0) AS n_orders
        |FROM customer LEFT JOIN (
        |  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY 1
        |) ON c_custkey = o_custkey
        |ORDER BY c_custkey""".stripMargin,

    "j5_negative_synthesis" ->
      """WITH grid AS (
        |  SELECT user_id, event_type
        |  FROM (SELECT DISTINCT user_id FROM events)
        |  CROSS JOIN (SELECT DISTINCT event_type FROM events)),
        |observed AS (
        |  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2)
        |SELECT event_type,
        |  CASE WHEN n IS NULL THEN 'negative' ELSE 'positive' END AS label,
        |  count(*) AS n_pairs
        |FROM grid LEFT JOIN observed USING (user_id, event_type)
        |GROUP BY 1, 2 ORDER BY event_type, label""".stripMargin,

    "j6_cross_join" ->
      """SELECT n_name, r_name FROM nation CROSS JOIN region
        |ORDER BY n_name, r_name""".stripMargin,

    "j7_broadcast_lookup" ->
      """SELECT r_name, count(*) AS n_suppliers
        |FROM supplier
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY r_name""".stripMargin,

    "j8_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 250000)
        |ORDER BY c_custkey""".stripMargin,

    "j8_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,

    "j9_join_count" ->
      """SELECT count(*) AS n_matched
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,

    "j10_asof_join" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_type, count(*) AS n,
        |  count(r.o_orderkey) AS n_matched,
        |  count(DISTINCT r.o_orderkey) AS n_orders
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "j12_native_asof" ->
      """WITH r AS (
        |  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
        |  FROM orders GROUP BY 1, 2)
        |SELECT e.event_type, count(*) AS n,
        |  count(r.o_orderkey) AS n_matched,
        |  count(DISTINCT r.o_orderkey) AS n_orders
        |FROM events e ASOF LEFT JOIN r
        |  ON e.user_id = r.o_custkey AND e.ts >= r.o_orderdate
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "j11_salted_join" ->
      """SELECT c_mktsegment, count(*) AS n_orders,
        |  count(DISTINCT o_custkey) AS n_custs
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    // the oracle is the naive inequality join — the bin-join must be
    // pair-identical to it
    "j13_range_join" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS sec
        |  FROM orders)
        |SELECT count(*) AS n_pairs,
        |  count(DISTINCT a.o_orderkey) AS n_anchors_with_follower,
        |  count(DISTINCT b.o_orderkey) AS n_followers
        |FROM o a JOIN o b ON a.o_custkey = b.o_custkey
        |  AND b.sec >= a.sec + 1 AND b.sec <= a.sec + 2592000""".stripMargin,

    "j14_fuzzy_join" ->
      """WITH probes AS (
        |  SELECT * FROM (VALUES ('smal ring'), ('red widgit'),
        |    ('blu bolt'), ('hot gearr'), ('purple elephant')) p(probe)),
        |names AS (SELECT DISTINCT p_name FROM part),
        |cand AS (
        |  SELECT probe, p_name FROM probes JOIN names
        |    ON string_split(probe, ' ')[1] = string_split(p_name, ' ')[1]
        |  UNION
        |  SELECT probe, p_name FROM probes JOIN names
        |    ON string_split(probe, ' ')[-1] = string_split(p_name, ' ')[-1])
        |SELECT probe, p_name, levenshtein(probe, p_name) AS dist
        |FROM cand
        |WHERE levenshtein(probe, p_name) <= 2
        |ORDER BY probe, dist, p_name""".stripMargin,

    "j15_fk_audit" ->
      """SELECT
        | (SELECT count(*) FROM lineitem l LEFT JOIN orders o
        |    ON l.l_orderkey = o.o_orderkey WHERE o.o_orderkey IS NULL)
        |   AS orphan_lineitems,
        | (SELECT count(*) FROM orders o LEFT JOIN customer c
        |    ON o.o_custkey = c.c_custkey WHERE c.c_custkey IS NULL)
        |   AS orphan_orders,
        | (SELECT count(*) FROM customer c WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey))
        |   AS childless_customers,
        | (SELECT count(*) FROM orders o WHERE NOT EXISTS
        |    (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey))
        |   AS childless_orders""".stripMargin,

    "j16_interval_overlap" ->
      """WITH o AS (
        |  SELECT o_custkey, o_orderkey,
        |    CAST(epoch(o_orderdate) AS BIGINT) AS s,
        |    CAST(epoch(o_orderdate) AS BIGINT)
        |      + (o_orderkey % 20 + 1) * 86400 AS e
        |  FROM orders)
        |SELECT count(*) AS n_pairs,
        |  count(DISTINCT a.o_custkey) AS n_custs,
        |  CAST(sum(least(a.e, b.e) - greatest(a.s, b.s)) AS BIGINT)
        |    AS sum_overlap_sec
        |FROM o a JOIN o b ON a.o_custkey = b.o_custkey
        |  AND a.o_orderkey < b.o_orderkey
        |  AND a.s <= b.e AND b.s <= a.e""".stripMargin
  )
}
