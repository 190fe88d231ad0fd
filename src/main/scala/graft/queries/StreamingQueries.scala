package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.streaming.StreamingOps

/** Event-time windowing over `events` — the batch face of the streaming
  * operators (StreamingOps; stream-mode behavior incl. watermark/late
  * data proven in StreamingSpec). Oracles replay window semantics with
  * time_bucket / gap arithmetic.
  */
object StreamingQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // Tumbling 1-hour windows per event type.
    "st1_tumbling_window" -> ((s, d) => {
      StreamingOps.tumblingCounts(Tables.events(s, d), "1 hour")
        .orderBy(col("win_start"), col("event_type"))
    }),

    // Gap-based sessionization (30-min inactivity) per user.
    "st2_session_window" -> ((s, d) => {
      StreamingOps.sessions(Tables.events(s, d), "30 minutes")
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_sessions"),
          sum(col("n_events")).as("n_events"))
        .orderBy(col("user_id"))
    }),

    // Hopping windows: 1-hour windows sliding every 30 minutes (each
    // event lands in exactly 2 windows).
    "st3_hopping_window" -> ((s, d) => {
      StreamingOps.hoppingCounts(Tables.events(s, d), "1 hour",
          "30 minutes")
        .orderBy(col("win_start"), col("event_type"))
    }),

    // Typed per-group processing: KeyValueGroupedDataset.flatMapGroups
    // reimplements the 30-min-gap sessionization imperatively per user —
    // same oracle as st2, proving the typed path agrees with the
    // session_window operator. Group payloads are bounded (one user's
    // events); the shuffle is the groupByKey hash exchange.
    "st4_typed_sessions" -> ((s, d) => {
      import s.implicits._
      val gapUs = 30L * 60 * 1000000
      Tables.events(s, d)
        .select(col("user_id"), expr("ts_ns div 1000").as("us"))
        .as[(Long, Long)]
        .groupByKey(_._1)
        .flatMapGroups { (user: Long, it: Iterator[(Long, Long)]) =>
          val times = it.map(_._2).toArray.sorted
          var sessions = 0
          var last = Long.MinValue
          times.foreach { t =>
            if (last == Long.MinValue || t - last >= gapUs) sessions += 1
            last = t
          }
          Iterator((user, sessions.toLong, times.length.toLong))
        }
        .toDF("user_id", "n_sessions", "n_events")
        .orderBy(col("user_id"))
    }),

    // Batch face of the stream-stream interval join (runtime behavior —
    // watermarks, state eviction — proven in StreamingSpec): click →
    // purchase attribution, each purchase matched to the same user's
    // clicks in the preceding hour. Runs on the binned range-join
    // operator, so the pairing is an equi-join on (user, time-bin) + an
    // exact range filter — never key-join-then-filter on a hot user,
    // never a nested loop.
    "st5_attribution_join" -> ((s, d) => {
      val hourUs = 3600000000L
      val ev = Tables.events(s, d).withColumn("us", expr("ts_ns div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("us"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          (col("us") - hourUs).as("start"), col("us").as("end"))
      graft.operators.Ops.rangeJoin(clicks, buys, "user_id",
          "us", "start", "end", binWidth = hourUs / 2)
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("buy_id")).as("n_attributed_buys"),
          countDistinct(col("click_id")).as("n_clicks_used"))
    }),

    // The LEFT-OUTER face of the interval join: every purchase keeps a
    // row whether or not a click preceded it — matched pairs plus the
    // "organic" remainder. In streaming this is the left-outer
    // stream-stream join (unmatched rows emit with nulls once the
    // watermark passes the join bound — StreamingSpec pins that
    // runtime); in batch the same semantics decompose into the binned
    // range join (inner pairs) + a left-anti join for the remainder —
    // both equi-joins on (user, bin) / buy_id, no outer-join state kept
    // anywhere.
    "st6_outer_attribution" -> ((s, d) => {
      val hourUs = 3600000000L
      val ev = Tables.events(s, d).withColumn("us", expr("ts_ns div 1000"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"), col("us"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("buy_id"),
          (col("us") - hourUs).as("start"), col("us").as("end"))
      val pairs = graft.operators.Ops.rangeJoin(clicks, buys, "user_id",
        "us", "start", "end", binWidth = hourUs / 2)
      val organic = buys
        .join(pairs.select(col("buy_id")).distinct(),
          Seq("buy_id"), "left_anti")
      pairs
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("buy_id")).as("n_attributed_buys"))
        .crossJoin(broadcast(buys.agg(count(lit(1)).as("n_buys"))))
        .crossJoin(broadcast(
          organic.agg(count(lit(1)).as("n_organic_buys"))))
        .select(col("n_buys"), col("n_pairs"),
          col("n_attributed_buys"), col("n_organic_buys"))
    })
  )

  val oracle: Map[String, String] = Map(
    "st1_tumbling_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS win_start,
        |  event_type, count(*) AS n
        |FROM events GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    // Session starts where the micro-second gap to the previous event of
    // the same user is >= 30 min (Spark session windows are
    // [start, last+gap), so an event at exactly last+gap opens a new
    // session). Micros (not ns) to match Spark's timestamp precision.
    "st2_session_window" ->
      """WITH m AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
        |marked AS (
        |  SELECT user_id,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |      >= 1800000000 OR
        |      lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM m)
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM marked GROUP BY 1 ORDER BY user_id""".stripMargin,

    "st4_typed_sessions" ->
      """WITH m AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS us FROM events),
        |marked AS (
        |  SELECT user_id,
        |    CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
        |      >= 1800000000 OR
        |      lag(us) OVER (PARTITION BY user_id ORDER BY us) IS NULL
        |    THEN 1 ELSE 0 END AS new_s
        |  FROM m)
        |SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
        |FROM marked GROUP BY 1 ORDER BY user_id""".stripMargin,

    "st3_hopping_window" ->
      """SELECT win_start, event_type, count(*) AS n FROM (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |    time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |    AS win_start, event_type
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin,

    "st5_attribution_join" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, us FROM ev
        |      WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id AS buy_id, us AS bus FROM ev
        |      WHERE event_type = 'purchase')
        |SELECT count(*) AS n_pairs,
        |  count(DISTINCT buy_id) AS n_attributed_buys,
        |  count(DISTINCT click_id) AS n_clicks_used
        |FROM c JOIN b ON c.user_id = b.user_id
        |  AND c.us >= bus - 3600000000 AND c.us <= bus""".stripMargin,

    "st6_outer_attribution" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type,
        |    epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |c AS (SELECT user_id, event_id AS click_id, us FROM ev
        |      WHERE event_type = 'click'),
        |b AS (SELECT user_id, event_id AS buy_id, us AS bus FROM ev
        |      WHERE event_type = 'purchase'),
        |p AS (
        |  SELECT b.buy_id, c.click_id
        |  FROM b LEFT JOIN c ON c.user_id = b.user_id
        |    AND c.us >= bus - 3600000000 AND c.us <= bus)
        |SELECT
        |  (SELECT count(*) FROM b) AS n_buys,
        |  (SELECT count(click_id) FROM p) AS n_pairs,
        |  (SELECT count(DISTINCT buy_id) FROM p WHERE click_id IS NOT NULL)
        |    AS n_attributed_buys,
        |  (SELECT count(*) FROM p WHERE click_id IS NULL)
        |    AS n_organic_buys""".stripMargin
  )
}
