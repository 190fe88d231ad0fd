package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Set operations and reshape — SURVEY.md §2.7 (U1-U3) + §2.8 (R1-R4),
  * plus intersect/except which the reference lacks.
  *
  * Scale notes: union is a zero-shuffle metadata concat; `distinct` /
  * `intersect` / `except` shuffle on the full row hash — they're applied
  * after narrow projections so the exchanged payload is just the key
  * columns. `unpivot` is a narrow per-row explode (no shuffle), replacing
  * the reference's loop-union anti-pattern (SURVEY §2.8 R2).
  */
object SetReshapeQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // U1/U2: union-by-name with missing-column fill — the bind_rows shape
    // (ref: src/06_integrate_ice.R:130; src/03_integrate_tox21.R:32-40).
    "u2_union_fill" -> ((s, d) => {
      val c = Tables.customer(s, d)
        .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("segment"))
      val sup = Tables.supplier(s, d)
        .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"))
      c.unionByName(sup, allowMissingColumns = true)
        .withColumn("segment", coalesce(col("segment"), lit("NONE")))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("segment"))
    }),

    // U3: dedup — distinct on a projection (ref: src/80_harmonize.py:37).
    "u3_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .select(col("l_returnflag"), col("l_linestatus"))
        .distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // Extra: intersect — nations that have both customers and suppliers.
    "u4_intersect" -> ((s, d) => {
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
      cn.intersect(sn).orderBy(col("nationkey"))
    }),

    // Extra: except — nations with customers but no suppliers.
    // EXCEPT against a SLICED supplier side: at sf >= 0.01 suppliers
    // cover all 25 nations, so the unfiltered difference is vacuously
    // empty — restricting the subtrahend to every-third nation keeps the
    // result non-empty (and non-total) at every sf.
    "u5_except" -> ((s, d) => {
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      val sn = Tables.supplier(s, d)
        .filter(col("s_nationkey") % 3 === 0)
        .select(col("s_nationkey").as("nationkey"))
      cn.except(sn).orderBy(col("nationkey"))
    }),

    // R1/R2: unpivot wide→long — the bindingdb measure melt
    // (ref: src/10_integrate_bindingdb.R:54; replaces the sider loop-union
    // anti-pattern src/15_integrate_sider.py:61-70).
    "r1_unpivot" -> ((s, d) => {
      Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast("double").as("size"),
          col("p_retailprice").as("retailprice"))
        .unpivot(Array(col("p_partkey")), Array(col("size"), col("retailprice")),
          "metric", "value")
        .groupBy(col("metric"))
        .agg(count(lit(1)).as("n"), max(col("value")).as("max_value"))
        .orderBy(col("metric"))
    }),

    // Generator null-preservation: explode_outer keeps rows whose array
    // is empty (the outer-generate path; plain explode would drop them).
    "u6_explode_outer" -> ((s, d) => {
      Tables.part(s, d)
        .withColumn("toks",
          expr("filter(split(lower(p_name), ' '), x -> x LIKE 'a%')"))
        .select(col("p_partkey"), explode_outer(col("toks")).as("tok"))
        .groupBy()
        .agg(count(lit(1)).as("n_rows"),
          count(when(col("tok").isNull, 1)).as("n_empty_parts"),
          countDistinct(col("tok")).as("n_tokens"))
    }),

    // Upsert / merge with latest-wins semantics: apply an update batch
    // (here a deterministic re-emission of every 10th event with a newer
    // timestamp) over the base table; one row survives per key, chosen by
    // (event time, change priority). This is the CDC-merge shape: union
    // is a metadata concat, and the only shuffle is the per-key window —
    // the same exchange a MERGE INTO would pay. A census over the merged
    // view proves exactly the updated keys changed.
    "u7_upsert_latest" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"),
          col("ts_ns"))
      val base = ev.withColumn("src", lit(0))
      val upd = ev.filter(col("event_id") % 10 === 0)
        .withColumn("value", col("value") + 0.5)
        .withColumn("ts_ns", col("ts_ns") + 1)
        .withColumn("src", lit(1))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_id"))
        .orderBy(col("ts_ns").desc, col("src").desc)
      base.unionByName(upd)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          graft.functions.Numeric.dsum(col("value")).as("sum_value"),
          sum(col("src")).as("n_updated"))
        .orderBy(col("event_type"))
    }),

    // SCD2 interval build — the slowly-changing-dimension history the
    // u7 latest-wins upsert discards: each event opens a validity
    // interval [ts, next event's ts) per user via lead(), the last one
    // stays open (NULL end). Per-type census of interval counts and
    // total closed duration. Scale shape: the window partitions by
    // user_id (bounded per-user state, hash-parallel — never a global
    // order), durations are integer microseconds (ts_ns div 1000 on
    // both engines — DuckDB's parquet reader floor-truncates nanos to
    // micros, so micro math is the cross-engine-exact granularity).
    "u8_scd2_intervals" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .withColumn("valid_to", lead(col("ts"), 1).over(w))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_intervals"),
          count(when(col("valid_to").isNull, 1)).as("n_open"),
          sum(when(col("valid_to").isNotNull,
            unix_micros(col("valid_to")) - unix_micros(col("ts"))))
            .cast("long").as("sum_dur_us"))
        .orderBy(col("event_type"))
    }),

    // R2 as the USER writes it: the reference's per-label loop-union melt
    // (ref: src/15_integrate_sider.py:61-70) built naively — one
    // lit-tagged slice per discovered label column, reduced with union.
    // Under a GraftExtensions session (Verify/Bench) the analyzer rule
    // plans.MeltUnionToExpand rewrites the whole union into ONE Expand
    // over ONE scan (the plan r1_unpivot's `.unpivot` gets); on a plain
    // session it still returns the identical multiset through the union,
    // so the oracle is plan-independent. MeltRuleSpec pins the rewrite.
    "r5_melt_union" -> ((s, d) => {
      val wide = Tables.part(s, d).select(
        col("p_partkey"),
        (col("p_size") > 25).cast("int").as("nr_large"),
        col("p_type").like("%BRASS%").cast("int").as("nr_brass"),
        col("p_type").like("PROMO%").cast("int").as("sr_promo"))
      val labels = wide.columns.toSeq.filterNot(_ == "p_partkey")
      val slices = labels.map(l => wide.select(
        col("p_partkey"), lit(l).as("label"),
        col(l).cast("double").as("value")))
      slices.reduce(_ union _)
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n"),
          sum(col("value")).cast("long").as("n_active"))
        .orderBy(col("label"))
    }),

    // The NO-discriminator melt: pooling several measure columns into
    // one value column for distribution profiling (all quantities,
    // prices, and scaled discounts as one sample pool). Naively one
    // slice per measure reduced with union — three passes over the fact
    // table. MeltUnionToExpand fires here too (no literal label
    // position required — any deterministic same-child Project union is
    // semantics-preserving as one Expand), so under a GraftExtensions
    // session this plans as ONE scan reading the three columns once.
    // Integer-bucket histogram output keeps the oracle float-proof.
    "r6_stacked_measures" -> ((s, d) => {
      val l = Tables.lineitem(s, d)
      val pool = l.select(col("l_quantity").as("v"))
        .union(l.select(col("l_extendedprice").as("v")))
        .union(l.select((col("l_discount") * lit(100)).as("v")))
      pool.groupBy(floor(col("v") / 1000).as("kbucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("kbucket"))
    }),

    // R4: nest-to-JSON struct pack — the staging `data` blob construction
    // (ref: src/09_integrate_pubchem.py:34, to_json(struct(...))).
    "r4_nest_json" -> ((s, d) => {
      Tables.nation(s, d)
        .withColumn("data",
          to_json(struct(col("n_name"), col("n_regionkey"))))
        .select(col("n_nationkey"), col("data"))
        .orderBy(col("n_nationkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "u2_union_fill" ->
      """SELECT coalesce(segment, 'NONE') AS segment, count(*) AS n FROM (
        |  SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment
        |  FROM customer
        |  UNION ALL
        |  SELECT s_name, s_acctbal, NULL FROM supplier)
        |GROUP BY 1 ORDER BY segment""".stripMargin,

    "u3_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "u4_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "u5_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey FROM supplier WHERE s_nationkey % 3 = 0
        |ORDER BY nationkey""".stripMargin,

    "r5_melt_union" ->
      """WITH wide AS (
        |  SELECT p_partkey,
        |    CAST(p_size > 25 AS INT) AS nr_large,
        |    CAST(p_type LIKE '%BRASS%' AS INT) AS nr_brass,
        |    CAST(p_type LIKE 'PROMO%' AS INT) AS sr_promo
        |  FROM part),
        |m AS (
        |  SELECT p_partkey, 'nr_large' AS label,
        |    CAST(nr_large AS DOUBLE) AS value FROM wide
        |  UNION ALL
        |  SELECT p_partkey, 'nr_brass', CAST(nr_brass AS DOUBLE) FROM wide
        |  UNION ALL
        |  SELECT p_partkey, 'sr_promo', CAST(sr_promo AS DOUBLE) FROM wide)
        |SELECT label, count(*) AS n, CAST(sum(value) AS BIGINT) AS n_active
        |FROM m GROUP BY label ORDER BY label""".stripMargin,

    "r6_stacked_measures" ->
      """WITH pool AS (
        |  SELECT l_quantity AS v FROM lineitem
        |  UNION ALL
        |  SELECT l_extendedprice FROM lineitem
        |  UNION ALL
        |  SELECT l_discount * 100 FROM lineitem)
        |SELECT CAST(floor(v / 1000) AS BIGINT) AS kbucket, count(*) AS n
        |FROM pool GROUP BY 1 ORDER BY kbucket""".stripMargin,

    "r1_unpivot" ->
      """SELECT metric, count(*) AS n, max(value) AS max_value FROM (
        |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS value
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'retailprice', p_retailprice FROM part)
        |GROUP BY 1 ORDER BY metric""".stripMargin,

    "u6_explode_outer" ->
      """SELECT count(*) AS n_rows,
        |  count(CASE WHEN u.tok IS NULL THEN 1 END) AS n_empty_parts,
        |  count(DISTINCT u.tok) AS n_tokens
        |FROM (
        |  SELECT p_partkey,
        |    list_filter(string_split(lower(p_name), ' '),
        |      x -> x LIKE 'a%') AS toks
        |  FROM part) t
        |LEFT JOIN LATERAL (SELECT unnest(toks) AS tok) AS u ON TRUE""".stripMargin,

    "r4_nest_json" ->
      """SELECT n_nationkey,
        |  to_json(struct_pack(n_name := n_name, n_regionkey := n_regionkey))
        |    AS data
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "u7_upsert_latest" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, value, epoch_ns(ts) AS ts_ns
        |  FROM events),
        |u AS (
        |  SELECT event_id, event_type, value, ts_ns, 0 AS src FROM ev
        |  UNION ALL
        |  SELECT event_id, event_type, value + 0.5, ts_ns + 1, 1 AS src
        |  FROM ev WHERE event_id % 10 = 0),
        |m AS (
        |  SELECT *, row_number() OVER (PARTITION BY event_id
        |    ORDER BY ts_ns DESC, src DESC) AS rn
        |  FROM u)
        |SELECT event_type, count(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
        |  CAST(sum(src) AS BIGINT) AS n_updated
        |FROM m WHERE rn = 1
        |GROUP BY 1 ORDER BY event_type""".stripMargin,

    "u8_scd2_intervals" ->
      """WITH iv AS (
        |  SELECT event_type, ts,
        |    lead(ts) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS valid_to
        |  FROM events)
        |SELECT event_type, count(*) AS n_intervals,
        |  count(CASE WHEN valid_to IS NULL THEN 1 END) AS n_open,
        |  CAST(sum(CASE WHEN valid_to IS NOT NULL
        |    THEN epoch_us(valid_to) - epoch_us(ts) END) AS BIGINT)
        |    AS sum_dur_us
        |FROM iv GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
