package graft.queries

import org.apache.spark.sql.functions._
import graft.enrich.Enrich
import graft.harmonize.Harmonize
import graft.sources.{EventsAdapter, LineitemAdapter, OrdersAdapter}

/** Enrichment over harmonized properties — the reference's LLM stages
  * with the deterministic rule backend (Enrich scaladoc). e1 runs the
  * actual Labeler flatMap (1→N, the UDTF shape); the oracle replays the
  * rules as SQL. e3 is the distributed title-uniqueness pass with the
  * prop_json_data payload (ref: src/92_llm_property_titles.py:71).
  */
object EnrichQueries extends QueryModule {

  private def properties(s: org.apache.spark.sql.SparkSession, d: String) =
    Harmonize.cachedBrick(s, d,
      Seq(EventsAdapter, OrdersAdapter, LineitemAdapter)).properties

  val queries: Map[String, Q] = Map(
    // D5: property → categories (1→N via typed flatMap of the Labeler).
    "e1_property_categories" -> ((s, d) => {
      import s.implicits._
      val props = properties(s, d).select(col("pid"), col("data")).distinct()
      val labeled = props.as[(String, String)].flatMap { case (pid, data) =>
        Enrich.RuleLabeler.label(data).map { case (c, r, st) =>
          (pid, c, r, st)
        }
      }.toDF("pid", "category", "reason", "strength")
      labeled.orderBy(col("pid"), col("category"))
    }),

    // Category census — the ≥10-categories-with-≥10-properties QC shape
    // (ref: src/91_property_categories.py:61-80) at testdata scale.
    "e2_category_census" -> ((s, d) => {
      import s.implicits._
      val props = properties(s, d).select(col("pid"), col("data")).distinct()
      props.as[(String, String)].flatMap { case (pid, data) =>
        Enrich.RuleLabeler.label(data).map { case (c, _, _) => (pid, c) }
      }.toDF("pid", "category")
        .groupBy(col("category"))
        .agg(countDistinct(col("pid")).as("n_props"))
        .orderBy(col("category"))
    }),

    // D6: globally-unique deterministic titles + prop_json_data.
    "e3_property_titles" -> ((s, d) => {
      Enrich.titles(properties(s, d)).orderBy(col("pid"))
    })
  )

  /** Distinct harmonized property (pid, data) pairs as SQL CTEs, layered
    * on the shared harmonize replay (the lineitem properties depend on
    * the integrator's support filtering — see HarmonizeQueries.actsCte).
    */
  private val propsCte: String = HarmonizeQueries.actsCte +
    """, props AS (
      |  SELECT DISTINCT md5(data) AS pid, data FROM (
      |    SELECT '{"event_type": "' || event_type || '"}' AS data
      |    FROM (SELECT DISTINCT event_type FROM events)
      |    UNION ALL
      |    SELECT '{"o_orderpriority": "' || o_orderpriority || '"}'
      |    FROM (SELECT DISTINCT o_orderpriority FROM orders)
      |    UNION ALL
      |    SELECT DISTINCT '{"s_nationkey": ' ||
      |      CAST(s_nationkey AS VARCHAR) || '}'
      |    FROM lsupp)),
      |labeled AS (
      |  SELECT pid, unnest(CASE
      |    WHEN json_extract_string(data, '$.s_nationkey') IS NOT NULL
      |      THEN [struct_pack(category := 'logistics',
      |              reason := 'supplier nation cohort')]
      |    WHEN json_extract_string(data, '$.event_type') IN ('click','view')
      |      THEN [struct_pack(category := 'engagement',
      |              reason := 'ui interaction signal')]
      |    WHEN json_extract_string(data, '$.event_type') = 'purchase'
      |      THEN [struct_pack(category := 'commerce',
      |              reason := 'monetary event'),
      |            struct_pack(category := 'engagement',
      |              reason := 'active use')]
      |    WHEN json_extract_string(data, '$.event_type') = 'signup'
      |      THEN [struct_pack(category := 'lifecycle',
      |              reason := 'account creation')]
      |    WHEN json_extract_string(data, '$.event_type') = 'error'
      |      THEN [struct_pack(category := 'reliability',
      |              reason := 'failure signal')]
      |    ELSE [struct_pack(category := 'urgency',
      |            reason := 'order priority class')] END) AS x
      |  FROM props)
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    "e1_property_categories" -> (propsCte +
      """SELECT pid, x.category AS category, x.reason AS reason,
        |  CAST(1 + length(x.category) % 10 AS DOUBLE) AS strength
        |FROM labeled ORDER BY pid, category""".stripMargin),

    "e2_category_census" -> (propsCte +
      """SELECT x.category AS category, count(DISTINCT pid) AS n_props
        |FROM labeled GROUP BY 1 ORDER BY category""".stripMargin),

    "e3_property_titles" -> (HarmonizeQueries.actsCte +
      """, props AS (
        |  SELECT DISTINCT md5(data) AS pid, data FROM (
        |    SELECT '{"event_type": "' || event_type || '"}' AS data
        |    FROM (SELECT DISTINCT event_type FROM events)
        |    UNION ALL
        |    SELECT '{"o_orderpriority": "' || o_orderpriority || '"}'
        |    FROM (SELECT DISTINCT o_orderpriority FROM orders)
        |    UNION ALL
        |    SELECT DISTINCT '{"s_nationkey": ' ||
        |      CAST(s_nationkey AS VARCHAR) || '}'
        |    FROM lsupp)),
        |based AS (
        |  SELECT pid, data,
        |    'Property ' || coalesce(
        |      json_extract_string(data, '$.event_type'),
        |      json_extract_string(data, '$.o_orderpriority'),
        |      json_extract_string(data, '$.s_nationkey'),
        |      pid) AS base
        |  FROM props),
        |seqd AS (
        |  SELECT pid, data, base,
        |    row_number() OVER (PARTITION BY base ORDER BY pid) AS seq
        |  FROM based)
        |SELECT pid,
        |  CASE WHEN seq = 1 THEN base ELSE base || ' #' || seq END AS title,
        |  data AS prop_json_data
        |FROM seqd ORDER BY pid""".stripMargin)
  )
}
