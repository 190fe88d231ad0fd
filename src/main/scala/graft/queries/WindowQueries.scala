package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.dsum

/** Window functions — SURVEY.md §2.5 (W1-W6) plus lead/lag/rank extras the
  * reference lacks but a complete engine needs.
  *
  * Scale notes: every window here partitions by a real key (user_id,
  * custkey, partkey) — partitions are bounded and hash-distribute across
  * executors. There is deliberately NO global `Window.orderBy` without
  * partitioning anywhere in the engine (single-partition collapse, SURVEY
  * §7.4 risk 5); global ids are content hashes instead (W3). Exact grouped
  * median over a window isn't supported by Spark, so W2 uses the
  * aggregate-then-join-back plan (SURVEY §2.5 design note) — the join side
  * is a per-group scalar, tiny, broadcast by AQE.
  */
object WindowQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // W1: count over partition, keep small groups
    // (ref: src/09_integrate_pubchem.py:28-29; the true single-entry
    // form runs in PubchemAdapter). Partitioned by (user, day): per-user
    // totals grow with sf, so a per-user cut is vacuously empty at gate
    // scale — the (user, day) grain keeps both kept and dropped groups
    // at every sf.
    "w1_count_over" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"), col("day"))
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .withColumn("n_user_day_events", count(lit(1)).over(w))
        .filter(col("n_user_day_events") <= 2)
        .select(col("event_id"), col("user_id"), col("n_user_day_events"))
        .orderBy(col("event_id"))
    }),

    // W2: grouped-mutate median (keep rows) via aggregate + join-back —
    // the binarize-by-median pivot (ref: src/01_integrate_toxvaldb.R:24;
    // exact percentile, not approx: SURVEY §4 decision 1).
    "w2_median_joinback" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val med = ev.groupBy(col("event_type"))
        .agg(expr("percentile(value, 0.5)").as("med_value"))
      ev.join(broadcast(med), Seq("event_type"))
        .withColumn("binary_value",
          when(col("value") >= col("med_value"), 1).otherwise(0))
        .groupBy(col("event_type"), col("binary_value"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("binary_value"))
    }),

    // W3: per-group id assignment — deterministic content hash instead of
    // the reference's per-group UUID (ref: src/01_integrate_toxvaldb.R:12,21;
    // SURVEY §4 decision 2).
    "w3_group_hash_id" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("sid", md5(concat_ws("|", col("user_id"))))
        .withColumn("pid", md5(concat_ws("|", col("event_type"))))
        .groupBy(col("pid"))
        .agg(countDistinct(col("sid")).as("n_sids"))
        .orderBy(col("pid"))
    }),

    // W4: partitioned row numbering — per-customer order sequence with a
    // unique tiebreak for determinism (ref: src/01_integrate_toxvaldb.R:42;
    // global row_number deliberately avoided).
    "w4_row_number" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("seq", row_number().over(w))
        .filter(col("seq") <= 3)
        .select(col("o_custkey"), col("seq"), col("o_orderkey"))
        .orderBy(col("o_custkey"), col("seq"))
    }),

    // W5: group-support filter via window count, preserving row granularity
    // before aggregating (ref: src/03_integrate_tox21.R:50).
    "w5_group_filter" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"), col("user_id"))
      Tables.events(s, d)
        .withColumn("n_in_group", count(lit(1)).over(w))
        .filter(col("n_in_group") >= 3)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("event_type"))
    }),

    // W6: group-degeneracy — users that only ever emit one event_type.
    // min==max over the partition is exact and cheaper than
    // size(collect_set) (ref: src/03_integrate_tox21.R:24).
    "w6_degeneracy" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
      Tables.events(s, d)
        .withColumn("one_type",
          (min(col("event_type")).over(w) === max(col("event_type")).over(w))
            .cast("int"))
        .groupBy()
        .agg(countDistinct(when(col("one_type") === 1, col("user_id")))
          .as("n_degenerate_users"))
    }),

    // Extra: lag + running sum over event time per user — the
    // sessionization / as-of primitive a training pipeline needs. Frame is
    // explicit rows-between (reference has no frames at all).
    "w7_lag_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_ns"), col("event_id"))
      val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("prev_value", lag(col("value"), 1).over(w))
        .withColumn("run_value",
          sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
            .over(wsum).cast("double"))
        .filter(col("prev_value").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n"),
          max(col("run_value")).as("max_run"))
        .orderBy(col("user_id"))
    }),

    // Extra: RANGE frame — events in the preceding hour per user (the
    // sliding event-time window as a numeric range frame over micros).
    "w9_range_frame" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"))
        .rangeBetween(-3600000000L, 0)
      Tables.events(s, d)
        .withColumn("us", expr("ts_ns div 1000"))
        .withColumn("n_last_hour", count(lit(1)).over(w))
        .groupBy(col("user_id"))
        .agg(max(col("n_last_hour")).as("max_burst"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"))
    }),

    // Extra: percent_rank / cume_dist / ntile — exact rational outputs
    // with a total order (unique tiebreak).
    "w10_rank_family" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("quartile", ntile(4).over(w))
        .groupBy(col("o_orderpriority"), col("quartile"))
        .agg(count(lit(1)).as("n"),
          min(col("pr")).as("min_pr"), max(col("cd")).as("max_cd"))
        .orderBy(col("o_orderpriority"), col("quartile"))
    }),

    // Extra: rank/dense_rank — top-2 orders per priority by price with
    // deterministic tiebreak.
    "w8_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", rank().over(w))
        .filter(col("rk") <= 2)
        .select(col("o_orderpriority"), col("rk"), col("o_orderkey"),
          col("o_totalprice"))
        .orderBy(col("o_orderpriority"), col("rk"))
    }),

    // Extra: batch sessionization — the gap-threshold session assignment
    // (lag → new-session flag → running sum), the batch twin of the
    // streaming session window (st2). One shuffle on user_id serves both
    // windows and the per-session aggregate; session spans stay in long
    // microseconds so the arithmetic is exact on any engine.
    "w11_sessionize" -> ((s, d) => {
      val gapUs = 3600000000L // 1 hour
      val wOrd = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .withColumn("us", expr("ts_ns div 1000"))
        .withColumn("gap", col("us") - lag(col("us"), 1).over(wOrd))
        .withColumn("is_new",
          when(col("gap").isNull || col("gap") > gapUs, 1).otherwise(0))
        .withColumn("sess", sum(col("is_new")).over(wRun))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("span_us"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          max(col("n_events")).as("max_session_events"),
          max(col("span_us")).as("max_span_us"))
        .orderBy(col("user_id"))
    }),

    // Robust per-group outlier census via MAD (median absolute
    // deviation) — the data-QC staple that, unlike z-scores, one hot
    // value can't poison. Two chained grouped medians (value, then
    // |value − med|), each the a5 sort+window shape that never buffers
    // a group in memory (percentile()'s ObjectHashAggregate is the
    // formulation that dies on 100 TB groups); both median frames are
    // group-cardinality-sized and broadcast back. Interpolation is
    // bit-identical to percentile()/quantile_cont (OpsSpec), so the
    // 3×MAD threshold comparison can't drift cross-engine.
    "w12_mad_outliers" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type"), col("value"))
      val med = graft.operators.Ops.groupedMedianBySort(
        ev, Seq("event_type"), "value", "med")
      val dev = ev.join(broadcast(med), Seq("event_type"))
        .withColumn("dev", abs(col("value") - col("med")))
      val mad = graft.operators.Ops.groupedMedianBySort(
        dev.select(col("event_type"), col("dev")),
        Seq("event_type"), "dev", "mad")
      dev.join(broadcast(mad), Seq("event_type"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          min(col("med")).as("med"),
          min(col("mad")).as("mad"),
          count(when(col("dev") > col("mad") * 3, 1)).as("n_outliers"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "w1_count_over" ->
      """SELECT event_id, user_id, n_user_day_events FROM (
        |  SELECT event_id, user_id,
        |    count(*) OVER (PARTITION BY user_id, CAST(ts AS DATE))
        |      AS n_user_day_events
        |  FROM events)
        |WHERE n_user_day_events <= 2 ORDER BY event_id""".stripMargin,

    "w2_median_joinback" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med_value
        |  FROM events GROUP BY 1)
        |SELECT event_type,
        |  CASE WHEN value >= med_value THEN 1 ELSE 0 END AS binary_value,
        |  count(*) AS n
        |FROM events JOIN med USING (event_type)
        |GROUP BY 1, 2 ORDER BY event_type, binary_value""".stripMargin,

    "w3_group_hash_id" ->
      """SELECT md5(CAST(event_type AS VARCHAR)) AS pid,
        |  count(DISTINCT md5(CAST(user_id AS VARCHAR))) AS n_sids
        |FROM events GROUP BY 1 ORDER BY pid""".stripMargin,

    "w4_row_number" ->
      """SELECT o_custkey, seq, o_orderkey FROM (
        |  SELECT o_custkey, o_orderkey,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate, o_orderkey) AS seq
        |  FROM orders)
        |WHERE seq <= 3 ORDER BY o_custkey, seq""".stripMargin,

    "w5_group_filter" ->
      """SELECT event_type, count(*) AS n_rows,
        |  count(DISTINCT user_id) AS n_users
        |FROM (
        |  SELECT *, count(*) OVER (PARTITION BY event_type, user_id) AS n_in_group
        |  FROM events)
        |WHERE n_in_group >= 3 GROUP BY 1 ORDER BY event_type""".stripMargin,

    "w6_degeneracy" ->
      """SELECT count(DISTINCT CASE WHEN one_type = 1 THEN user_id END)
        |    AS n_degenerate_users
        |FROM (
        |  SELECT user_id,
        |    CAST(min(event_type) OVER (PARTITION BY user_id) =
        |         max(event_type) OVER (PARTITION BY user_id) AS INT) AS one_type
        |  FROM events)""".stripMargin,

    "w7_lag_running" ->
      """SELECT user_id, count(*) AS n, max(run_value) AS max_run FROM (
        |  SELECT user_id,
        |    lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_value,
        |    CAST(SUM(CAST(value AS DECIMAL(18,4)))
        |      OVER (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DOUBLE) AS run_value
        |  FROM events)
        |WHERE prev_value IS NOT NULL
        |GROUP BY 1 ORDER BY user_id""".stripMargin,

    "w9_range_frame" ->
      """SELECT user_id, max(n_last_hour) AS max_burst, count(*) AS n FROM (
        |  SELECT user_id,
        |    count(*) OVER (PARTITION BY user_id ORDER BY us
        |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |      AS n_last_hour
        |  FROM (SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events))
        |GROUP BY 1 ORDER BY user_id""".stripMargin,

    "w10_rank_family" ->
      """SELECT o_orderpriority, quartile, count(*) AS n,
        |  min(pr) AS min_pr, max(cd) AS max_cd FROM (
        |  SELECT o_orderpriority,
        |    percent_rank() OVER w AS pr,
        |    cume_dist() OVER w AS cd,
        |    ntile(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority
        |    ORDER BY o_totalprice, o_orderkey))
        |GROUP BY 1, 2 ORDER BY o_orderpriority, quartile""".stripMargin,

    "w8_rank" ->
      """SELECT o_orderpriority, rk, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |  FROM orders)
        |WHERE rk <= 2 ORDER BY o_orderpriority, rk""".stripMargin,

    "w11_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events),
        |marked AS (
        |  SELECT user_id, event_id, us,
        |    CASE WHEN us - lag(us) OVER w IS NULL
        |           OR us - lag(us) OVER w > 3600000000 THEN 1 ELSE 0 END
        |      AS is_new
        |  FROM e
        |  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)),
        |sessed AS (
        |  SELECT user_id, us,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM marked),
        |per AS (
        |  SELECT user_id, sess, count(*) AS n_events,
        |    max(us) - min(us) AS span_us
        |  FROM sessed GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |  max(n_events) AS max_session_events,
        |  CAST(max(span_us) AS BIGINT) AS max_span_us
        |FROM per GROUP BY 1 ORDER BY user_id""".stripMargin,

    "w12_mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY 1),
        |dev AS (
        |  SELECT e.event_type, med, abs(value - med) AS dev
        |  FROM events e JOIN med USING (event_type)),
        |mad AS (
        |  SELECT event_type, quantile_cont(dev, 0.5) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT d.event_type, count(*) AS n, min(med) AS med,
        |  min(mad) AS mad,
        |  count(CASE WHEN dev > mad * 3 THEN 1 END) AS n_outliers
        |FROM dev d JOIN mad USING (event_type)
        |GROUP BY 1 ORDER BY event_type""".stripMargin
  )
}
