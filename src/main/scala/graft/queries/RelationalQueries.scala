package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.Numeric.{davg, dsum, dsumProduct}

/** Scans, projections, filters, predicates and aggregations.
  *
  * Covers SURVEY.md §2.1 (S1, S3, S8), §2.2 (P1-P9), §2.4 (A1-A8, A10).
  * Each query is the reference's operator re-expressed over the TESTDATA
  * tables so the DuckDB oracle can replay it; Scaladoc on each entry cites
  * the reference site it mirrors.
  *
  * Scale notes: every aggregation here is a partial-agg-friendly
  * hash aggregate (map-side combine before the shuffle); filters and
  * projections sit directly on the parquet scan so Catalyst pushes them
  * into the reader (verified via .explain: PushedFilters / ReadSchema).
  */
object RelationalQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // S1 + P1 + P3/P7: projection + predicate pushed into the parquet scan
    // (ref: src/09_integrate_pubchem.py:24-25).
    "s1_scan_project_filter" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R" && col("l_quantity") < 5)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_returnflag"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // S3 + U1: file-path provenance capture, the reference's staging-union
    // trick (ref: src/80_harmonize.py:22-36) — `source` derived from
    // input_file_name() with pure expressions, no UDF (replaces D4).
    "s3_provenance_union" -> ((s, d) => {
      val src = regexp_extract(input_file_name(), "([a-z]+)\\.parquet", 1)
      val c = Tables.customer(s, d)
        .select(col("c_name").as("name"), src.as("source"))
      val sup = Tables.supplier(s, d)
        .select(col("s_name").as("name"), src.as("source"))
      c.unionByName(sup).orderBy(col("source"), col("name"))
    }),

    // S8: local-collection source joined to a table
    // (ref: src/13_integrate_BBBP.py:52, literal properties rows).
    "s8_local_collection" -> ((s, d) => {
      import s.implicits._
      val lookup = Seq(
        ("AFRICA", "AF"), ("AMERICA", "AM"), ("ASIA", "AS"),
        ("EUROPE", "EU"), ("MIDDLE EAST", "ME")
      ).toDF("r_name", "code")
      Tables.region(s, d).join(broadcast(lookup), Seq("r_name"))
        .select(col("r_regionkey"), col("r_name"), col("code"))
        .orderBy(col("r_regionkey"))
    }),

    // P4/P5/P6/P7: set membership, null checks, compound boolean, range
    // (ref: src/09_integrate_pubchem.py:51-53; src/16_integrate_clintox.py:38).
    "p6_compound_predicates" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderstatus").isin("F", "O") &&
          col("o_orderpriority").isNotNull &&
          !isnan(col("o_totalprice")) &&
          col("o_totalprice") > 1000 && col("o_totalprice") < 100000)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // P8 + P9: multi-way case_when decode + binary conditional
    // (ref: src/02_integrate_chembl.R:31-52; src/13_integrate_BBBP.py:61).
    "p8_case_when" -> ((s, d) => {
      val cls = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "high")
        .when(col("o_orderpriority") === "3-MEDIUM", "medium")
        .otherwise("low")
      val big = when(col("o_totalprice") > 200000, 1).otherwise(0)
      Tables.orders(s, d)
        .withColumn("priority_class", cls).withColumn("is_big", big)
        .groupBy(col("priority_class"), col("is_big"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("priority_class"), col("is_big"))
    }),

    // A1: group count (ref: src/91_property_categories.py:19).
    "a1_group_count" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // A2 + A8: grouped min/max/sum/avg multi-metric summarize
    // (ref: src/91_property_categories.py:20; src/01_integrate_toxvaldb.R:26).
    "a2_min_max_sum" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          min(col("l_quantity")).as("min_qty"),
          max(col("l_quantity")).as("max_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag"))
    }),

    // A3: conditional sum within group (ref: src/02_integrate_chembl.R:62,
    // `sum(value=="positive")`).
    "a3_conditional_sum" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("l_discount") > 0.05, 1).otherwise(0)).as("n_disc"),
          sum(when(col("l_tax") === 0.0, 1).otherwise(0)).as("n_notax"))
        .orderBy(col("l_returnflag"))
    }),

    // A4: exact count-distinct within group (ref: src/02_integrate_chembl.R:60-61).
    // At 100 TB swap for approx_count_distinct behind the exactness config
    // (SURVEY §7.4 risk 6); exact is required for oracle parity here.
    "a4_count_distinct" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(col("l_partkey")).as("n_part"))
        .orderBy(col("l_returnflag"))
    }),

    // A5: EXACT grouped median — the reference's binarization pivot
    // (ref: src/01_integrate_toxvaldb.R:22-24; SURVEY §4 decision 1:
    // percentile(), not percentile_approx(), for reproducible semantics).
    "a5_median_exact" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(expr("percentile(l_quantity, 0.5)").as("med_qty"),
          expr("percentile(l_extendedprice, 0.5)").as("med_price"))
        .orderBy(col("l_returnflag"))
    }),

    // A6: group-filter / HAVING (ref: src/01_integrate_toxvaldb.R:23,
    // keep groups with n() > 500).
    "a6_group_having" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_partkey"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .filter(col("n") >= 40)
        .orderBy(col("l_partkey"))
    }),

    // A7 + R3: pivot aggregation, the pubchem pos/neg QC query
    // (ref: src/09_integrate_pubchem.py:66). Explicit value list avoids the
    // extra distinct-scan pass and pins column order.
    "a7_pivot_counts" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_linestatus"))
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .count()
        .na.fill(0L, Seq("A", "N", "R"))
        .orderBy(col("l_linestatus"))
    }),

    // A10: group-wise round(median(value)) — toxcast hitcall consensus
    // (ref: src/04_integrate_toxcast.R:37).
    "a10_median_round" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderpriority"))
        .agg(round(expr("percentile(o_totalprice, 0.5)"), 0).as("med_price"))
        .orderBy(col("o_orderpriority"))
    }),

    // A9: size-by-key table census — per-table profiling loop
    // (ref: src/06_integrate_ice.R:13-14) as one unioned query.
    "a9_table_census" -> ((s, d) => {
      import s.implicits._
      val stats = Seq(
        ("customer", Tables.customer(s, d).select(col("c_custkey"))),
        ("supplier", Tables.supplier(s, d).select(col("s_suppkey"))),
        ("part", Tables.part(s, d).select(col("p_partkey"))),
        ("orders", Tables.orders(s, d).select(col("o_orderkey"))))
      stats.map { case (name, df) =>
        df.agg(count(lit(1)).as("n_rows"),
          countDistinct(df.columns.head).as("n_keys"))
          .withColumn("tbl", lit(name))
          .select("tbl", "n_rows", "n_keys")
      }.reduce(_ unionByName _).orderBy(col("tbl"))
    }),

    // Rollup — hierarchical subtotals (absent in the reference; part of a
    // complete engine's grouping surface).
    "a11_rollup" -> ((s, d) => {
      Tables.lineitem(s, d)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first,
          col("l_linestatus").asc_nulls_first)
    }),

    // Cube — full grouping-set lattice.
    "a12_cube" -> ((s, d) => {
      Tables.orders(s, d)
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first,
          col("o_orderpriority").asc_nulls_first)
    }),

    // Explicit GROUPING SETS with grouping_id — the general grouping
    // lattice (rollup/cube are the special cases above).
    "a15_grouping_sets" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT l_returnflag, l_linestatus,
              |  grouping_id(l_returnflag, l_linestatus) AS gid,
              |  count(*) AS n
              |FROM lineitem_v
              |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
              |  (l_returnflag), ())
              |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin)
    }),

    // Approx count-distinct — the 100 TB swap for A4's exact distinct
    // (SURVEY §7.4 risk 6). HLL++ values are engine-specific ⇒ no SQL
    // oracle (rows-only); A4ApproxSpec bounds the error vs exact.
    // Data-profiling moments the numerically-safe way for a 100 TB
    // scan: ONE pass of exact integer power sums (n, Σx, Σx², Σy, Σy²,
    // Σxy — each a codegen'd map-side-combining sum, order-independent
    // because integer addition is associative), then mean/variance/
    // correlation derived in a single final float expression per group.
    // Never the two-pass subtract-the-mean form (a second scan) and
    // never a float running sum (order-dependent at shuffle scale);
    // both engines evaluate the identical IEEE expression tree over
    // identical integers, so even corr hashes equal cross-engine.
    "a19_exact_moments" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("lang"), col("n_chars").as("x"),
          size(split(lower(col("text")), " ")).cast("long").as("y"))
      base.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sx2"),
          sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("sy2"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("lang"), col("n"), col("sx"), col("sy"),
          (col("sx").cast("double") / col("n")).as("mean_x"),
          ((col("n") * col("sx2") - col("sx") * col("sx")).cast("double") /
            (col("n") * col("n"))).as("var_x"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sx2") - col("sx") * col("sx"))
              .cast("double")) *
             sqrt((col("n") * col("sy2") - col("sy") * col("sy"))
              .cast("double")))).as("corr_xy"))
        .orderBy(col("lang"))
    }),

    // Skew diagnostics — the census that decides between a plain
    // shuffle join and the j11 salted form BEFORE the job runs: per-key
    // counts (one map-side-combining aggregate), then global shape
    // stats over the (much smaller) key-count frame with the 1-row
    // stats broadcast back for the hot-key cut (count > 2× mean). At
    // 100 TB the key-count frame is |keys| rows, not |rows|, and the
    // only full-data pass is the first aggregate; skew_ratio =
    // max·keys/rows is the number you compare against the AQE
    // skewedPartitionFactor to pick the salting fan-out.
    "a20_skew_profile" -> ((s, d) => {
      val kc = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey")).agg(count(lit(1)).as("c"))
      val tot = kc.agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(col("c")).as("max_per_key"),
        expr("percentile(c, 0.5)").as("med_per_key"))
      kc.crossJoin(broadcast(tot))
        .groupBy(col("n_keys"), col("n_rows"), col("max_per_key"),
          col("med_per_key"))
        .agg(count(when(col("c") * col("n_keys") >
          lit(2) * col("n_rows"), 1)).as("n_hot_keys"))
        .withColumn("skew_ratio",
          (col("max_per_key") * col("n_keys")).cast("double") /
            col("n_rows"))
    }),

    "a13_approx_distinct" -> ((s, d) => {
      // HLL++ estimate validated against the exact count in-query: the
      // oracle pins the exact count and expects the 2%-rsd sketch to land
      // within 5% (deterministic — HLL is a pure function of the data).
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_suppkey"), 0.02).as("approx"),
          countDistinct(col("l_suppkey")).as("n_supp_exact"))
        .withColumn("hll_within_5pct",
          abs(col("approx") - col("n_supp_exact")) <=
            col("n_supp_exact") * 0.05)
        .select("l_returnflag", "n_supp_exact", "hll_within_5pct")
        .orderBy(col("l_returnflag"))
    }),

    // The other half of the SURVEY §7.4-risk-6 exactness config: the
    // percentile_approx scale path (GK sketch, mergeable, bounded
    // memory — what replaces exact percentile at 100 TB), validated
    // in-query against the exact median the oracle pins.
    "a16_approx_quantile" -> ((s, d) => {
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(graft.operators.Ops.medianExpr("l_extendedprice",
            graft.operators.Ops.Approx).as("approx"),
          expr("percentile(l_extendedprice, 0.5)").as("med_exact"))
        .withColumn("approx_within_1pct",
          abs(col("approx") / col("med_exact") - 1) <= 0.01)
        .select("l_returnflag", "med_exact", "approx_within_1pct")
        .orderBy(col("l_returnflag"))
    }),

    // Misra-Gries heavy hitters (custom typed Aggregator, the third
    // sketch beside HLL/GK): tokens above the n/40 frequency floor,
    // with the in-query check that the bounded-memory sketch contains
    // every exact heavy hitter — the MG containment guarantee. The
    // sketch aggregate ships ≤ 40 counters per map task; the exact side
    // exists to validate it and stays oracle-replayable.
    // Count-Min point queries — the fourth mergeable sketch (HLL a13,
    // GK a16, MG a17): d×w counter grid, entrywise-sum merge, so the
    // exchange carries d·w longs per map task at ANY input cardinality.
    // In-query validation, a13-style: the oracle pins the exact top-20
    // counts and the two contract flags — CMS never underestimates
    // (structural), and on this corpus the overestimate stays within
    // n_total/64 (w=256 ⇒ expected collision mass ≈ n/256 per row,
    // min over d=4 rows far below the flagged bound).
    "a21_count_min" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "")
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      val total = counts.agg(sum(col("cnt")).as("n_total"))
      val sketch = toks.agg(
        graft.functions.CountMin.cmsSketch(4, 256)(col("token")).as("cms"))
      counts
        .orderBy(col("cnt").desc, col("token")).limit(20)
        .crossJoin(broadcast(sketch))
        .crossJoin(broadcast(total))
        .withColumn("est",
          graft.functions.CountMin.probe(4, 256)(col("token"), col("cms")))
        .select(col("token"), col("cnt"),
          (col("est") >= col("cnt")).as("never_under"),
          (col("est") - col("cnt") <= col("n_total") / 64)
            .as("within_bound"))
        .orderBy(col("cnt").desc, col("token"))
    }),

    // Exact grouped MODE via the argmin-struct trick: after the
    // (group, value) count, ONE more ordinary aggregate —
    // min(struct(−cnt, value)) — picks highest-count-then-lowest-value
    // lexicographically, with map-side partial merge and no window
    // (the window formulation sorts every group's full value census;
    // this shape reduces it). The tiebreak is EXPLICIT in both engines
    // because DuckDB's mode() leaves ties unspecified — the oracle
    // replays the same argmin, not the builtin.
    "a22_group_mode" -> ((s, d) => {
      Tables.orders(s, d)
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"))
        .groupBy(col("o_orderstatus"))
        .agg(min(struct((-col("cnt")).as("nc"),
          col("o_orderpriority").as("v"))).as("m"),
          sum(col("cnt")).as("n_rows"))
        .select(col("o_orderstatus"),
          col("m.v").as("mode_priority"),
          (-col("m.nc")).as("mode_count"), col("n_rows"))
        .orderBy(col("o_orderstatus"))
    }),

    "a17_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "")
      val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      // total derives from the tiny counts frame — no second corpus scan
      val total = counts.agg(sum(col("cnt")).as("n_total"))
      val sketch = toks.agg(
        graft.functions.HeavyHitters.mgSketch(40)(col("token")).as("sk"))
      counts.crossJoin(broadcast(total))
        .filter(col("cnt") * 40 > col("n_total"))
        .crossJoin(broadcast(sketch))
        .withColumn("mg_contains", map_contains_key(col("sk"), col("token")))
        .select(col("token"), col("cnt"), col("mg_contains"))
        .orderBy(col("cnt").desc, col("token"))
    }),

    // Grouped MG sketch — one bounded summary PER GROUP (the per-domain/
    // per-language frequent-terms column a corpus report needs). Same
    // aggregator, keyed aggregate: state is groups × k counters, each
    // map task ships one k-entry summary per group it saw. Floor n/30
    // per language, k=40 > 30 keeps the containment guarantee per group.
    "a18_grouped_heavy_hitters" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(col("lang"),
          explode(split(lower(col("text")), " ")).as("token"))
        .filter(col("token") =!= "")
      val counts = toks.groupBy(col("lang"), col("token"))
        .agg(count(lit(1)).as("cnt"))
      // per-lang totals from the aggregated frame — no extra corpus scan
      val totals = counts.groupBy(col("lang"))
        .agg(sum(col("cnt")).as("n_lang"))
      val sketches = toks.groupBy(col("lang"))
        .agg(graft.functions.HeavyHitters.mgSketch(40)(col("token"))
          .as("sk"))
      counts.join(broadcast(totals), Seq("lang"))
        .filter(col("cnt") * 30 > col("n_lang"))
        .join(broadcast(sketches), Seq("lang"))
        .withColumn("mg_contains", map_contains_key(col("sk"), col("token")))
        .select(col("lang"), col("token"), col("cnt"), col("mg_contains"))
        .orderBy(col("lang"), col("cnt").desc, col("token"))
    }),

    // Multi-quantile profiling — exact quartiles per group (the
    // distribution census a pipeline runs before choosing thresholds).
    // Exact grouped quartiles via the sort+window shape
    // (Ops.groupedQuantilesBySort) — bit-identical to
    // percentile(v, array(...)) (OpsSpec) but spillable: the aggregate
    // formulation buffers every group value in one ObjectHashAggregate
    // map entry, the plan shape a 100 TB group cannot survive. The
    // honest round-9 barrier measured the buffering form at 2.6s here;
    // this is also the backlog-#8 closure.
    "a14_quantiles" -> ((s, d) => {
      graft.operators.Ops.groupedQuantilesBySort(
          Tables.lineitem(s, d), Seq("l_returnflag"), "l_extendedprice",
          Seq(0.25, 0.5, 0.75), Seq("q25", "q50", "q75"))
        .orderBy(col("l_returnflag"))
    }),

    // SQL-text entry point: temp views + spark.sql — the parse→analyze→
    // optimize path of the engine's SQL surface.
    "q2_sql_api" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      s.sql("""SELECT o_orderpriority, count(*) AS n
              |FROM orders_v JOIN customer_v ON o_custkey = c_custkey
              |WHERE c_mktsegment = 'BUILDING'
              |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin)
    }),

    // Subquery surface: Catalyst rewrites these into semi/anti/cross
    // joins (RewritePredicateSubquery / scalar subquery planning) — the
    // engine capability, not just the syntax.
    "q6_exists_subquery" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("customer_v")
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT c_mktsegment, count(*) AS n FROM customer_v
              |WHERE EXISTS (SELECT 1 FROM orders_v
              |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
              |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin)
    }),

    // Scalar subquery against the EXACT median (avg of doubles would be
    // partition-order dependent — the median is deterministic).
    "q7_scalar_subquery" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("orders_v")
      s.sql("""SELECT o_orderstatus, count(*) AS n FROM orders_v
              |WHERE o_totalprice >
              |  (SELECT percentile(o_totalprice, 0.5) FROM orders_v)
              |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin)
    }),

    "q8_in_subquery" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part_v")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT count(*) AS n_parts FROM part_v
              |WHERE p_partkey IN
              |  (SELECT l_partkey FROM lineitem_v WHERE l_quantity > 49)
              |""".stripMargin)
    }),

    // NOT IN → null-aware anti join path.
    "q9_not_in_subquery" -> ((s, d) => {
      Tables.part(s, d).createOrReplaceTempView("part_v")
      Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
      s.sql("""SELECT count(*) AS n_parts FROM part_v
              |WHERE p_partkey NOT IN
              |  (SELECT l_partkey FROM lineitem_v WHERE l_quantity > 49)
              |""".stripMargin)
    }),

    // TPC-H Q3-shaped shipping priority: selective dimension filter →
    // two fact joins → aggregate → top-10. Exercises join reorder,
    // pushdown through joins, and TakeOrdered.
    "q3_shipping_priority" -> ((s, d) => {
      val cust = Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
      val cutoff = to_timestamp(lit("1995-03-15"))
      val ord = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
      val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5-shaped local-supplier volume: 6-way join through two
    // broadcast dims + three fact/mid tables with a co-location
    // predicate (customer and supplier in the same nation).
    // Join order matters at scale: the selective r_name = 'ASIA' cut is
    // applied to nation FIRST and broadcast into customer and supplier,
    // so the big lineitem/orders joins see only the ~1/5 of rows that
    // can contribute — instead of joining the full fact volume and
    // cutting by region last (classic Q5 ordering).
    "q5_local_supplier" -> ((s, d) => {
      val asiaNations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d)),
          col("n_regionkey") === col("r_regionkey") &&
            col("r_name") === "ASIA")
        .select(col("n_nationkey"), col("n_name"))
      val cust = Tables.customer(s, d)
        .join(broadcast(asiaNations),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_nationkey"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(asiaNations),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
      val ord = Tables.orders(s, d)
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("c_nationkey"))
      Tables.lineitem(s, d)
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(supp,
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // Flagship: TPC-H Q1-shaped pricing summary — the densest exercise of
    // scan + pushdown + multi-metric hash aggregate.
    "q1_pricing_summary" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("2001-09-01")))
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
            .as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // TPC-H Q10-shaped returned-item report: who returned the most
    // revenue — fact filter + two joins + top-20.
    "q10_returned_items" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q12-shaped priority split: per return flag, how many lines
    // belong to high- vs low-priority orders after a shipdate cutoff.
    "q12_priority_split" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= to_timestamp(lit("1995-01-01")))
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1)
            .otherwise(0)).as("high_line_count"),
          sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0)
            .otherwise(1)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    }),

    // TPC-H Q14-shaped promo share: ratio of two exact decimal sums —
    // division happens once, on two bit-identical doubles.
    "q14_promo_share" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .agg(
          (lit(100.0) *
            dsumProduct(when(col("p_type").startsWith("PROMO"),
              col("l_extendedprice")).otherwise(0.0),
              lit(1) - col("l_discount")) /
            dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount")))
            .as("promo_revenue_pct"))
    }),

    // TPC-H Q11-shaped important parts: per-group value filtered against
    // a GLOBAL scalar fraction — the aggregate-vs-global-threshold shape
    // (one extra scalar crossed into every group, no re-scan).
    "q11_important_parts" -> ((s, d) => {
      val perPart = Tables.lineitem(s, d).groupBy(col("l_partkey"))
        .agg(dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("part_value"))
      // threshold = 1.25× the MEAN per-part value, not a fixed fraction
      // of the total: part cardinality scales with sf, so a fixed
      // fraction returns everything at small sf and nothing at large —
      // the mean-relative cut keeps the result non-empty and non-total
      // at every sf. Same multiply-then-divide order as the oracle so
      // near-threshold doubles compare identically.
      val total = perPart.agg(dsum(col("part_value")).as("total_value"),
        count(lit(1)).as("n_parts"))
      perPart.crossJoin(broadcast(total))
        .filter(col("part_value") >
          (col("total_value") * 1.25) / col("n_parts"))
        .select(col("l_partkey"), col("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    }),

    // TPC-H Q18-shaped large-volume customers: IN-over-grouped-HAVING —
    // the aggregated-subquery semi-join shape (big orders found by a
    // lineitem aggregate, then joined back through orders to customers).
    "q18_large_volume" -> ((s, d) => {
      val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 250)
      Tables.orders(s, d)
        .join(big, col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    }),

    // TPC-H Q13-shaped order-count distribution: left-outer join kept
    // customers with zero orders, then a two-level aggregate — count per
    // customer, histogram of those counts. The outer join is the one
    // shuffle on custkey; both aggregates above it are tiny.
    "q13_order_distribution" -> ((s, d) => {
      val ords = Tables.orders(s, d)
        .filter(!col("o_orderpriority").startsWith("1-"))
        .select(col("o_custkey"), col("o_orderkey"))
      Tables.customer(s, d).select(col("c_custkey"))
        .join(ords, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    }),

    // TPC-H Q16-shaped supplier variety: distinct-supplier counts per
    // part attribute bucket, with exclusion predicates on the part side
    // and an anti-join against flagged suppliers. The distinct on
    // (part, supplier) pairs happens BEFORE the part join — dedup the
    // fact once, then join the slim pair set. Lineitem stands in for
    // partsupp; negative-balance suppliers stand in for the complaints
    // filter.
    "q16_supplier_variety" -> ((s, d) => {
      // the reference relation is distinct (part, supplier) pairs
      // (TPC-H's partsupp), but materializing the distinct costs a full
      // lineitem shuffle and buys nothing: countDistinct(l_suppkey) is
      // invariant under duplicate pairs, and its own first aggregation
      // level dedups (brand, type, size, suppkey) map-side before the
      // only remaining exchange. One shuffle instead of two, same rows.
      val ps = Tables.lineitem(s, d)
        .select(col("l_partkey"), col("l_suppkey"))
      val excl = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
        .select(col("s_suppkey"))
      ps.join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(col("p_brand") =!= "Brand#1" &&
          !col("p_type").startsWith("MEDIUM"))
        .join(excl, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(20)
    }),

    // TPC-H Q17-shaped small-quantity revenue: the correlated-aggregate
    // threshold (l_quantity < 0.2 × that part's average) decorrelated
    // into a per-part aggregate + equi-join — one lineitem scan feeds
    // both the aggregate and the probe via exchange reuse.
    "q17_small_quantity" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val avgQ = li.groupBy(col("l_partkey"))
        .agg(davg(col("l_quantity")).as("avg_qty"))
      li.join(avgQ, Seq("l_partkey"))
        .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q19-shaped disjunctive predicates: OR-of-ANDs across both
    // join sides. Catalyst extracts the common conjuncts (p_type IN ...,
    // l_quantity range) and pushes them into BOTH scans, so the join
    // only sees pre-filtered rows — the plan shape that matters when
    // each branch alone is unselective but their union is.
    "q19_disjunctive" -> ((s, d) => {
      Tables.lineitem(s, d)
        .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
        .filter(
          (col("p_type") === "PROMO" &&
            col("l_quantity").between(1, 11) && col("p_size") <= 15) ||
          (col("p_type") === "ECONOMY" &&
            col("l_quantity").between(10, 20) && col("p_size") <= 25) ||
          (col("p_type") === "STANDARD" &&
            col("l_quantity").between(20, 30) && col("p_size") <= 50))
        .agg(dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
            .as("revenue"),
          count(lit(1)).as("n_lines"))
    }),

    // TPC-H Q20-shaped "dominant supplier": a grouped sum compared
    // against its group's total — the correlated-threshold IN-subquery
    // of Q20, adapted to this schema (no partsupp: lineitem is the
    // part↔supplier link; availqty → shipped qty). The fraction-of-
    // group is a WINDOW over the grouped frame, not a groupBy+self-join
    // (one exchange fewer, no duplicate scan); the per-part total sums
    // in decimal inside the window so it stays order-independent at
    // any parallelism. Both sides compute `0.5 * total` in double from
    // identical inputs, so the strict > is cross-engine stable.
    "q20_dominant_supplier" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val shipped = Tables.lineitem(s, d)
        .join(Tables.part(s, d).filter(col("p_size") <= 10)
          .select(col("p_partkey")),
          col("l_partkey") === col("p_partkey"))
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(dsum(col("l_quantity")).as("qty"))
      val w = Window.partitionBy(col("l_partkey"))
      shipped
        .withColumn("total",
          sum(col("qty").cast(DecimalType(18, 4))).over(w).cast("double"))
        .filter(col("qty") > lit(0.5) * col("total"))
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_suppkey"), col("s_name"))
        .agg(count(lit(1)).as("n_dominant_parts"))
        .orderBy(col("s_suppkey"))
    }),

    // TPC-H Q21-shaped "suppliers who kept orders waiting": the
    // EXISTS / NOT-EXISTS pair over the same fact table, adapted to
    // this schema (late = shipped >90 days after the order date; the
    // reference schema's receipt/commit dates don't exist here).
    // EXISTS compiles to a left-semi and NOT EXISTS to a left-anti
    // join on the order key with the supplier-inequality as a join
    // residual — three passes over lineitem but every one an equi-join
    // shuffle on l_orderkey, the scalable shape (never a per-order
    // subquery loop).
    "q21_waiting_supplier" -> ((s, d) => {
      val late = Tables.lineitem(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderstatus") === "F")
          .select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .filter(col("l_shipdate") >
          col("o_orderdate") + expr("INTERVAL 90 DAYS"))
        .select(col("l_orderkey"), col("l_suppkey"))
      val others = Tables.lineitem(s, d)
        .select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
      val lateOthers = late
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"))
      late
        .join(others, col("l_orderkey") === col("k2") &&
          col("l_suppkey") =!= col("s2"), "left_semi")
        .join(lateOthers, col("l_orderkey") === col("k3") &&
          col("l_suppkey") =!= col("s3"), "left_anti")
        .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    }),

    // TPC-H Q22-shaped "idle customers with means": a global scalar
    // threshold (average positive balance, broadcast) + NOT IN over a
    // distinct key set (anti join — o_custkey is non-null so the
    // NOT-IN null trap doesn't bite), grouped by segment (this
    // schema's stand-in for the phone prefix). The scalar average is
    // the exact decimal sum over count, so the `>` cut is identical on
    // both engines.
    "q22_idle_customers" -> ((s, d) => {
      val avgBal = Tables.customer(s, d)
        .filter(col("c_acctbal") > 0)
        .agg(davg(col("c_acctbal")).as("a"))
      val recent = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
        .select(col("o_custkey"))
      Tables.customer(s, d)
        .crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("a"))
        .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          dsum(col("c_acctbal")).as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    }),

    // TPC-H Q4-shaped "order priority checking": count orders per
    // priority that have at least one late line. The reference
    // schema's commit/receipt dates don't exist here, so "late" is the
    // q21 rule (shipped >60 days after the order date). The correlated
    // EXISTS compiles to ONE left-semi shuffle join on l_orderkey with
    // the date inequality as a join residual — per-order dedup is free
    // (semi join emits each order at most once), no distinct, no
    // subquery loop; both scans keep only two columns.
    "q4_priority_check" -> ((s, d) => {
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .join(Tables.lineitem(s, d)
            .select(col("l_orderkey"), col("l_shipdate")),
          col("l_orderkey") === col("o_orderkey") &&
            col("l_shipdate") >
              col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    }),

    // TPC-H Q15-shaped "top supplier": quarterly revenue per supplier,
    // then the supplier(s) whose revenue equals the global max — the
    // CREATE VIEW + scalar-subquery shape. The revenue frame is one
    // map-combined hash aggregate off a pushed-down scan; the max is a
    // single-row aggregate of THAT frame broadcast back over it (the
    // view is computed once per branch of a self-referencing plan, both
    // branches tiny after the agg). The double equality is safe because
    // both sides come from the same order-independent decimal sum — the
    // max IS one of the values, bit-identical on any engine.
    "q15_top_supplier" -> ((s, d) => {
      // the explicit isNotNull matches what the supplier join pushes
      // into its branch, so BOTH consumers of `revenue` canonicalize to
      // the same exchange and ReuseExchange computes the scan+aggregate
      // ONCE (without it the max branch re-scans lineitem)
      val revenue = Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-04-01").cast("timestamp") &&
          col("l_suppkey").isNotNull)
        .groupBy(col("l_suppkey"))
        .agg(dsumProduct(col("l_extendedprice"), lit(1) - col("l_discount"))
          .as("total_revenue"))
      val best = revenue.agg(max(col("total_revenue")).as("m"))
      revenue
        .crossJoin(broadcast(best))
        .filter(col("total_revenue") === col("m"))
        .join(broadcast(Tables.supplier(s, d)
            .select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "s1_scan_project_filter" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
        |FROM lineitem WHERE l_returnflag = 'R' AND l_quantity < 5
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "s3_provenance_union" ->
      """SELECT * FROM (
        |  SELECT c_name AS name, 'customer' AS source FROM customer
        |  UNION ALL
        |  SELECT s_name AS name, 'supplier' AS source FROM supplier
        |) ORDER BY source, name""".stripMargin,

    "s8_local_collection" ->
      """SELECT r_regionkey, r_name, code
        |FROM region JOIN (VALUES ('AFRICA','AF'),('AMERICA','AM'),('ASIA','AS'),
        |  ('EUROPE','EU'),('MIDDLE EAST','ME')) AS l(r_name, code) USING (r_name)
        |ORDER BY r_regionkey""".stripMargin,

    "p6_compound_predicates" ->
      """SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus IN ('F','O') AND o_orderpriority IS NOT NULL
        |  AND NOT isnan(o_totalprice)
        |  AND o_totalprice > 1000 AND o_totalprice < 100000
        |ORDER BY o_orderkey""".stripMargin,

    "p8_case_when" ->
      """SELECT
        |  CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'high'
        |       WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
        |       ELSE 'low' END AS priority_class,
        |  CASE WHEN o_totalprice > 200000 THEN 1 ELSE 0 END AS is_big,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY priority_class, is_big""".stripMargin,

    "a1_group_count" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n FROM lineitem
        |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "a2_min_max_sum" ->
      """SELECT l_returnflag,
        |  min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(l_discount) AS avg_disc,
        |  count(*) AS n
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "a3_conditional_sum" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_disc,
        |  CAST(SUM(CASE WHEN l_tax = 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_notax
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "a4_count_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp,
        |  count(DISTINCT l_partkey) AS n_part
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "a5_median_exact" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.5) AS med_qty,
        |  quantile_cont(l_extendedprice, 0.5) AS med_price
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "a6_group_having" ->
      """SELECT l_partkey, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 40
        |ORDER BY l_partkey""".stripMargin,

    "a7_pivot_counts" ->
      """SELECT l_linestatus,
        |  count(*) FILTER (WHERE l_returnflag = 'A') AS "A",
        |  count(*) FILTER (WHERE l_returnflag = 'N') AS "N",
        |  count(*) FILTER (WHERE l_returnflag = 'R') AS "R"
        |FROM lineitem GROUP BY 1 ORDER BY l_linestatus""".stripMargin,

    "a10_median_round" ->
      """SELECT o_orderpriority,
        |  round(quantile_cont(o_totalprice, 0.5), 0) AS med_price
        |FROM orders GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "a9_table_census" ->
      """SELECT * FROM (
        |  SELECT 'customer' AS tbl, count(*) AS n_rows,
        |    count(DISTINCT c_custkey) AS n_keys FROM customer
        |  UNION ALL SELECT 'supplier', count(*), count(DISTINCT s_suppkey)
        |    FROM supplier
        |  UNION ALL SELECT 'part', count(*), count(DISTINCT p_partkey)
        |    FROM part
        |  UNION ALL SELECT 'orders', count(*), count(DISTINCT o_orderkey)
        |    FROM orders)
        |ORDER BY tbl""".stripMargin,

    "a11_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "a12_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus NULLS FIRST,
        |  o_orderpriority NULLS FIRST""".stripMargin,

    "a15_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |  grouping_id(l_returnflag, l_linestatus) AS gid,
        |  count(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), ())
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,

    "a20_skew_profile" ->
      """WITH kc AS (
        |  SELECT l_orderkey AS k, count(*) AS c FROM lineitem GROUP BY 1),
        |tot AS (
        |  SELECT count(*) AS n_keys, CAST(sum(c) AS BIGINT) AS n_rows,
        |    max(c) AS max_per_key,
        |    CAST(quantile_cont(c, 0.5) AS DOUBLE) AS med_per_key
        |  FROM kc)
        |SELECT n_keys, n_rows, max_per_key, med_per_key,
        |  count(CASE WHEN c * n_keys > 2 * n_rows THEN 1 END) AS n_hot_keys,
        |  CAST(max_per_key * n_keys AS DOUBLE) / n_rows AS skew_ratio
        |FROM kc CROSS JOIN tot
        |GROUP BY 1, 2, 3, 4""".stripMargin,

    "a19_exact_moments" ->
      """WITH base AS (
        |  SELECT lang, n_chars AS x,
        |    CAST(len(string_split(lower(text), ' ')) AS BIGINT) AS y
        |  FROM documents),
        |sums AS (
        |  SELECT lang, count(*) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(x * x) AS BIGINT) AS sx2,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(y * y) AS BIGINT) AS sy2,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM base GROUP BY 1)
        |SELECT lang, n, sx, sy,
        |  CAST(sx AS DOUBLE) / n AS mean_x,
        |  CAST(n * sx2 - sx * sx AS DOUBLE) / (n * n) AS var_x,
        |  CAST(n * sxy - sx * sy AS DOUBLE) /
        |    (sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)) *
        |     sqrt(CAST(n * sy2 - sy * sy AS DOUBLE))) AS corr_xy
        |FROM sums ORDER BY lang""".stripMargin,

    // The oracle pins the exact count and the tolerance contract; the
    // Spark side computes the HLL estimate and reports whether it held.
    "a13_approx_distinct" ->
      """SELECT l_returnflag,
        |  count(DISTINCT l_suppkey) AS n_supp_exact,
        |  TRUE AS hll_within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "a16_approx_quantile" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.5) AS med_exact,
        |  TRUE AS approx_within_1pct
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "a21_count_min" ->
      """WITH t AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents)
        |SELECT token, count(*) AS cnt,
        |  TRUE AS never_under, TRUE AS within_bound
        |FROM t WHERE token <> ''
        |GROUP BY 1 ORDER BY cnt DESC, token LIMIT 20""".stripMargin,

    // same explicit argmin tiebreak as the Spark side — DuckDB's
    // builtin mode() is unspecified on ties
    "a22_group_mode" ->
      """WITH c AS (
        |  SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |  FROM orders GROUP BY 1, 2),
        |ranked AS (
        |  SELECT o_orderstatus, o_orderpriority, cnt,
        |    row_number() OVER (PARTITION BY o_orderstatus
        |      ORDER BY cnt DESC, o_orderpriority) AS rn,
        |    sum(cnt) OVER (PARTITION BY o_orderstatus) AS n_rows
        |  FROM c)
        |SELECT o_orderstatus, o_orderpriority AS mode_priority,
        |  CAST(cnt AS BIGINT) AS mode_count,
        |  CAST(n_rows AS BIGINT) AS n_rows
        |FROM ranked WHERE rn = 1 ORDER BY o_orderstatus""".stripMargin,

    "a17_heavy_hitters" ->
      """WITH t AS (
        |  SELECT unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT token, count(*) AS cnt FROM t
        |      WHERE token <> '' GROUP BY 1),
        |n AS (SELECT count(*) AS n_total FROM t WHERE token <> '')
        |SELECT token, cnt, TRUE AS mg_contains
        |FROM c CROSS JOIN n
        |WHERE cnt * 40 > n_total
        |ORDER BY cnt DESC, token""".stripMargin,

    "a18_grouped_heavy_hitters" ->
      """WITH t AS (
        |  SELECT lang, unnest(string_split(lower(text), ' ')) AS token
        |  FROM documents),
        |c AS (SELECT lang, token, count(*) AS cnt FROM t
        |      WHERE token <> '' GROUP BY 1, 2),
        |n AS (SELECT lang, count(*) AS n_lang FROM t
        |      WHERE token <> '' GROUP BY 1)
        |SELECT c.lang AS lang, token, cnt, TRUE AS mg_contains
        |FROM c JOIN n ON c.lang = n.lang
        |WHERE cnt * 30 > n_lang
        |ORDER BY c.lang, cnt DESC, token""".stripMargin,

    "a14_quantiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_extendedprice, 0.25) AS q25,
        |  quantile_cont(l_extendedprice, 0.5) AS q50,
        |  quantile_cont(l_extendedprice, 0.75) AS q75
        |FROM lineitem GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q6_exists_subquery" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY c_mktsegment""".stripMargin,

    "q7_scalar_subquery" ->
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE o_totalprice >
        |  (SELECT quantile_cont(o_totalprice, 0.5) FROM orders)
        |GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "q8_in_subquery" ->
      """SELECT count(*) AS n_parts FROM part
        |WHERE p_partkey IN
        |  (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)""".stripMargin,

    "q9_not_in_subquery" ->
      """SELECT count(*) AS n_parts FROM part
        |WHERE p_partkey NOT IN
        |  (SELECT l_partkey FROM lineitem WHERE l_quantity > 49)""".stripMargin,

    "q3_shipping_priority" ->
      """SELECT l_orderkey, o_orderdate,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
        |  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
        |GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q5_local_supplier" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY 1 ORDER BY revenue DESC, n_name""".stripMargin,

    "q2_sql_api" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
        |GROUP BY 1, 2 ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q10_returned_items" ->
      """SELECT c_custkey, c_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE l_returnflag = 'R'
        |GROUP BY 1, 2 ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q12_priority_split" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |GROUP BY 1 ORDER BY l_returnflag""".stripMargin,

    "q14_promo_share" ->
      """SELECT 100.0 *
        |  CAST(SUM(CAST(CAST(CASE WHEN p_type LIKE 'PROMO%'
        |      THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4)) *
        |    CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |    AS DOUBLE) /
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS promo_revenue_pct
        |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin,

    "q11_important_parts" ->
      """WITH per_part AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |      AS DOUBLE) AS part_value
        |  FROM lineitem GROUP BY 1),
        |total AS (
        |  SELECT CAST(SUM(CAST(part_value AS DECIMAL(18,4))) AS DOUBLE)
        |    AS total_value, count(*) AS n_parts
        |  FROM per_part)
        |SELECT l_partkey, part_value
        |FROM per_part CROSS JOIN total
        |WHERE part_value > (total_value * 1.25) / n_parts
        |ORDER BY part_value DESC, l_partkey""".stripMargin,

    "q18_large_volume" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      AS total_qty
        |  FROM lineitem GROUP BY 1
        |  HAVING total_qty > 250)
        |SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty
        |FROM orders
        |JOIN big ON o_orderkey = l_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 20""".stripMargin,

    "q13_order_distribution" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN (
        |    SELECT o_custkey, o_orderkey FROM orders
        |    WHERE o_orderpriority NOT LIKE '1-%') o
        |    ON c_custkey = o_custkey
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q16_supplier_variety" ->
      """SELECT p_brand, p_type, p_size,
        |  count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'MEDIUM%'
        |  AND l_suppkey NOT IN
        |    (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 20""".stripMargin,

    "q17_small_quantity" ->
      """WITH a AS (
        |  SELECT l_partkey,
        |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
        |      / count(l_quantity) AS avg_qty
        |  FROM lineitem GROUP BY 1)
        |SELECT
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    / 7.0 AS avg_yearly,
        |  count(*) AS n_lines
        |FROM lineitem JOIN a USING (l_partkey)
        |WHERE l_quantity < 0.2 * avg_qty""".stripMargin,

    "q19_disjunctive" ->
      """SELECT
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |    CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |    AS DOUBLE) AS revenue,
        |  count(*) AS n_lines
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_type = 'PROMO' AND l_quantity BETWEEN 1 AND 11
        |        AND p_size <= 15)
        |   OR (p_type = 'ECONOMY' AND l_quantity BETWEEN 10 AND 20
        |        AND p_size <= 25)
        |   OR (p_type = 'STANDARD' AND l_quantity BETWEEN 20 AND 30
        |        AND p_size <= 50)""".stripMargin,

    "q20_dominant_supplier" ->
      """WITH shipped AS (
        |  SELECT l_partkey, l_suppkey,
        |    CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  WHERE p_size <= 10
        |    AND l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate <  TIMESTAMP '1998-01-01'
        |  GROUP BY 1, 2),
        |tot AS (
        |  SELECT l_partkey,
        |    CAST(sum(CAST(qty AS DECIMAL(18,4))) AS DOUBLE) AS total
        |  FROM shipped GROUP BY 1)
        |SELECT s_suppkey, s_name, count(*) AS n_dominant_parts
        |FROM shipped JOIN tot USING (l_partkey)
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE qty > 0.5 * total
        |GROUP BY 1, 2 ORDER BY 1""".stripMargin,

    "q21_waiting_supplier" ->
      """WITH late AS (
        |  SELECT l_orderkey, l_suppkey
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE o_orderstatus = 'F'
        |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
        |SELECT s_name, count(*) AS numwait
        |FROM late l1 JOIN supplier ON l1.l_suppkey = s_suppkey
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM late l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey)
        |GROUP BY 1 ORDER BY numwait DESC, s_name LIMIT 10""".stripMargin,

    "q22_idle_customers" ->
      """WITH avg_bal AS (
        |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
        |    / count(c_acctbal) AS a
        |  FROM customer WHERE c_acctbal > 0),
        |recent AS (
        |  SELECT DISTINCT o_custkey FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '2001-01-01')
        |SELECT c_mktsegment, count(*) AS numcust,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
        |FROM customer, avg_bal
        |WHERE c_acctbal > a
        |  AND c_custkey NOT IN (SELECT o_custkey FROM recent)
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q4_priority_check" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY 1 ORDER BY o_orderpriority""".stripMargin,

    "q15_top_supplier" ->
      """WITH revenue AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) *
        |      CAST(1 - l_discount AS DECIMAL(18,4)) AS DECIMAL(28,4)))
        |      AS DOUBLE) AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier JOIN revenue ON s_suppkey = l_suppkey
        |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin
  )
}
