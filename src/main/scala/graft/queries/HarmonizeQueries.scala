package graft.queries

import org.apache.spark.sql.functions._
import graft.harmonize.Harmonize
import graft.sources.{EventsAdapter, LineitemAdapter, OrdersAdapter}

/** The chemharmony domain pipeline end-to-end — SURVEY §3.1 (harmonize)
  * and §2.12 (the reference's embedded QC queries) over the TESTDATA
  * tables, with the entire staging→canonicalize→re-key→smiles→aid chain
  * replayed in DuckDB SQL as the oracle.
  *
  * Three SourceAdapters (events, orders, and the composite chembl-shaped
  * lineitem integrator) stand in for the reference's 15; the brick shape,
  * id algebra (md5-of-canonical-JSON, aid over sid|pid|inchi|value,
  * src/80_harmonize.py:83), structure enrichment (distinct inchi →
  * convert → join back, py:72-73), and QC invariants are the
  * reference's own.
  */
object HarmonizeQueries extends QueryModule {

  private def brick(s: org.apache.spark.sql.SparkSession, d: String) =
    Harmonize.cachedBrick(s, d,
      Seq(EventsAdapter, OrdersAdapter, LineitemAdapter))

  val queries: Map[String, Q] = Map(
    // Brick substances: union + canonicalize + md5 re-key
    // (ref: src/80_harmonize.py:33-43).
    "h1_substances_brick" -> ((s, d) => {
      brick(s, d).substances.orderBy(col("sid"), col("source"))
    }),

    // Brick properties (ref: src/80_harmonize.py:48-58). pid uniqueness is
    // QC-asserted downstream (py:104-105) — h6 covers the count side.
    "h2_properties_brick" -> ((s, d) => {
      brick(s, d).properties.orderBy(col("pid"), col("source"))
    }),

    // Brick activities QC profile over the FULL reference schema:
    // per-(source, value) counts, distinct aids, distinct joined-back
    // smiles (the D2 enrichment), binary_value totals, numvalue range
    // (ref: src/80_harmonize.py:63-99 assembly + count assertions).
    "h3_activities_qc" -> ((s, d) => {
      brick(s, d).activities
        .groupBy(col("source"), col("value"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("aid")).as("n_aids"),
          countDistinct(col("smiles")).as("n_smiles"),
          sum(col("binary_value")).as("n_pos"),
          min(col("numvalue")).as("min_num"),
          max(col("numvalue")).as("max_num"))
        .orderBy(col("source"), col("value"))
    }),

    // Class-support pivot: pids with >=100 positives AND >=100 negatives —
    // the pubchem QC query (ref: src/09_integrate_pubchem.py:64-68).
    "h4_support_pivot" -> ((s, d) => {
      brick(s, d).activities
        .groupBy(col("pid"))
        .pivot("value", Seq("positive", "negative"))
        .count()
        .na.fill(0L, Seq("positive", "negative"))
        .filter(col("positive") >= 100 && col("negative") >= 100)
        .orderBy(col("pid"))
    }),

    // Cross-table consistency: per-source property count in `properties`
    // equals distinct pids in `activities` — the reference's only
    // standalone test (ref: src/tests.py:17-56, full-outer-join compare).
    "h5_consistency" -> ((s, d) => {
      val b = brick(s, d)
      val nProps = b.properties.groupBy(col("source"))
        .agg(count(lit(1)).as("n_props"))
      val nApids = b.activities.groupBy(col("source"))
        .agg(countDistinct(col("pid")).as("n_apids"))
      nProps.join(nApids, Seq("source"), "full_outer")
        .select(col("source"),
          coalesce(col("n_props"), lit(0L)).as("n_props"),
          coalesce(col("n_apids"), lit(0L)).as("n_apids"))
        .withColumn("consistent", col("n_props") === col("n_apids"))
        .orderBy(col("source"))
    }),

    // Dedup idempotence: raw row count equals distinct aid count — the
    // pubchem before/after-distinct check (ref: src/09_integrate_pubchem.py:
    // 71-76) strengthened by content-addressed aids.
    "h6_dedup_idempotence" -> ((s, d) => {
      brick(s, d).activities
        .agg(count(lit(1)).as("n_raw"),
          countDistinct(col("aid")).as("n_aids"))
    }),

    // The composite integrator's staging output end-to-end: 3-way join →
    // case_when decode → discordance filter → pair median → support
    // filters → triplet (ref: src/02_integrate_chembl.R:24-86).
    "h7_composite_integrator" -> ((s, d) => {
      graft.sources.SourceAdapter.cachedStaging(LineitemAdapter, s, d)
        .activities.orderBy(col("aid"))
    }),

    // The ICE-shaped integrator end-to-end: cross-product negative
    // synthesis + median binarization + deterministic per-endpoint
    // class balancing (ref: src/06_integrate_ice.R:49-110).
    "h8_ice_grid" -> ((s, d) => {
      graft.sources.SourceAdapter
        .cachedStaging(graft.sources.IceAdapter, s, d)
        .activities.orderBy(col("aid"))
    })
  )

  /** Shared oracle CTE chain replaying staging + harmonize in DuckDB.
    * The canonical `data` bytes are Python json.dumps style (': ' / ', '
    * separators — see CanonicalJson), built here by string concat since
    * DuckDB's to_json is compact. Shared with EnrichQueries (the
    * enrichment stages read the same harmonized properties).
    */
  private[queries] val actsCte: String =
    """WITH epair AS (
      |  SELECT user_id, event_type, quantile_cont(value, 0.5) AS numvalue
      |  FROM events GROUP BY 1, 2),
      |emed AS (
      |  SELECT event_type, quantile_cont(numvalue, 0.5) AS med
      |  FROM epair GROUP BY 1),
      |eacts AS (
      |  SELECT md5('{"user_id": ' || CAST(user_id AS VARCHAR) || '}') AS sid,
      |    md5('{"event_type": "' || event_type || '"}') AS pid,
      |    'InChI=1S/U' || CAST(user_id AS VARCHAR) AS inchi,
      |    CASE WHEN numvalue >= med THEN 'positive' ELSE 'negative' END AS value,
      |    numvalue, 'events' AS source
      |  FROM epair JOIN emed USING (event_type)),
      |opair AS (
      |  SELECT o_custkey, o_orderpriority,
      |    quantile_cont(o_totalprice, 0.5) AS numvalue
      |  FROM orders GROUP BY 1, 2),
      |omed AS (
      |  SELECT o_orderpriority, quantile_cont(numvalue, 0.5) AS med
      |  FROM opair GROUP BY 1),
      |oacts AS (
      |  SELECT md5('{"c_custkey": ' || CAST(c_custkey AS VARCHAR) ||
      |      ', "c_name": "' || c_name || '"}') AS sid,
      |    md5('{"o_orderpriority": "' || o_orderpriority || '"}') AS pid,
      |    'InChI=1S/C' || CAST(o_custkey AS VARCHAR) AS inchi,
      |    CASE WHEN numvalue >= med THEN 'positive' ELSE 'negative' END AS value,
      |    numvalue, 'orders' AS source
      |  FROM opair
      |  JOIN omed USING (o_orderpriority)
      |  JOIN customer ON o_custkey = c_custkey),
      |ldec AS (
      |  SELECT md5('part:' || CAST(p_partkey AS VARCHAR)) AS sid,
      |    md5('snation:' || CAST(s_nationkey AS VARCHAR)) AS pid,
      |    s_nationkey, p_partkey, p_brand,
      |    CASE WHEN l_returnflag = 'A' THEN 'positive'
      |         WHEN l_returnflag = 'R' THEN 'negative'
      |         WHEN l_returnflag = 'N' AND l_quantity >= 40 THEN 'positive'
      |         WHEN l_returnflag = 'N' AND l_quantity <= 10 THEN 'negative'
      |    END AS value,
      |    l_extendedprice
      |  FROM lineitem
      |  JOIN part ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey),
      |lconc AS (
      |  SELECT * FROM (
      |    SELECT sid, pid, s_nationkey, p_partkey, p_brand, value,
      |      l_extendedprice,
      |      min(value) OVER (PARTITION BY sid, pid)
      |        = max(value) OVER (PARTITION BY sid, pid) AS single
      |    FROM ldec WHERE value IS NOT NULL) WHERE single),
      |lpairs AS (
      |  SELECT sid, pid, s_nationkey, p_partkey, p_brand, value,
      |    quantile_cont(l_extendedprice, 0.5) AS numvalue
      |  FROM lconc GROUP BY 1, 2, 3, 4, 5, 6),
      |lsupp AS (
      |  SELECT * FROM (
      |    SELECT *, count(*) OVER (PARTITION BY pid) AS nsid,
      |      count(*) FILTER (WHERE value = 'positive')
      |        OVER (PARTITION BY pid) AS npos,
      |      count(*) FILTER (WHERE value = 'negative')
      |        OVER (PARTITION BY pid) AS nneg
      |    FROM lpairs)
      |  WHERE nsid >= 20 AND npos >= 10 AND nneg >= 10),
      |lacts AS (
      |  -- staging ids (sid/pid above) are only the grouping keys; the
      |  -- brick re-keys to md5(canonical data) — emit the FINAL ids here
      |  -- like eacts/oacts do
      |  SELECT
      |    md5('{"p_brand": "' || p_brand || '", "p_partkey": ' ||
      |      CAST(p_partkey AS VARCHAR) || '}') AS sid,
      |    md5('{"s_nationkey": ' || CAST(s_nationkey AS VARCHAR) || '}')
      |      AS pid,
      |    'InChI=1S/P' || CAST(p_partkey AS VARCHAR) AS inchi,
      |    value, numvalue, 'lineitem' AS source
      |  FROM lsupp),
      |allacts AS (
      |  SELECT md5(concat_ws('|', sid, pid, inchi, value)) AS aid,
      |    sid, pid, source, inchi,
      |    'GS:' || substr(inchi, 10) AS smiles,
      |    value,
      |    CASE WHEN value = 'positive' THEN 1 ELSE 0 END AS binary_value,
      |    numvalue
      |  FROM (SELECT * FROM eacts UNION ALL SELECT * FROM oacts
      |        UNION ALL SELECT * FROM lacts))
      |""".stripMargin

  val oracle: Map[String, String] = Map(
    "h1_substances_brick" -> (actsCte +
      """SELECT md5(data) AS sid, source, data FROM (
        |  SELECT 'events' AS source,
        |    '{"user_id": ' || CAST(user_id AS VARCHAR) || '}' AS data
        |  FROM (SELECT DISTINCT user_id FROM events)
        |  UNION ALL
        |  SELECT 'orders',
        |    '{"c_custkey": ' || CAST(c_custkey AS VARCHAR) ||
        |      ', "c_name": "' || c_name || '"}'
        |  FROM customer
        |  UNION ALL
        |  SELECT DISTINCT 'lineitem',
        |    '{"p_brand": "' || p_brand || '", "p_partkey": ' ||
        |      CAST(p_partkey AS VARCHAR) || '}'
        |  FROM lsupp)
        |ORDER BY sid, source""".stripMargin),

    "h2_properties_brick" -> (actsCte +
      """SELECT md5(data) AS pid, source, data FROM (
        |  SELECT 'events' AS source,
        |    '{"event_type": "' || event_type || '"}' AS data
        |  FROM (SELECT DISTINCT event_type FROM events)
        |  UNION ALL
        |  SELECT 'orders',
        |    '{"o_orderpriority": "' || o_orderpriority || '"}' AS data
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders)
        |  UNION ALL
        |  SELECT DISTINCT 'lineitem',
        |    '{"s_nationkey": ' || CAST(s_nationkey AS VARCHAR) || '}'
        |  FROM lsupp)
        |ORDER BY pid, source""".stripMargin),

    "h3_activities_qc" -> (actsCte +
      """SELECT source, value, count(*) AS n, count(DISTINCT aid) AS n_aids,
        |  count(DISTINCT smiles) AS n_smiles,
        |  CAST(SUM(binary_value) AS BIGINT) AS n_pos,
        |  min(numvalue) AS min_num, max(numvalue) AS max_num
        |FROM allacts GROUP BY 1, 2 ORDER BY source, value""".stripMargin),

    "h4_support_pivot" -> (actsCte +
      """SELECT pid,
        |  count(*) FILTER (WHERE value = 'positive') AS positive,
        |  count(*) FILTER (WHERE value = 'negative') AS negative
        |FROM allacts GROUP BY 1
        |HAVING positive >= 100 AND negative >= 100
        |ORDER BY pid""".stripMargin),

    "h5_consistency" -> (actsCte +
      """, props AS (
        |  SELECT 'events' AS source, count(*) AS n_props
        |  FROM (SELECT DISTINCT event_type FROM events)
        |  UNION ALL
        |  SELECT 'orders', count(*)
        |  FROM (SELECT DISTINCT o_orderpriority FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem', count(DISTINCT s_nationkey)
        |  FROM lsupp),
        |apids AS (
        |  SELECT source, count(DISTINCT pid) AS n_apids
        |  FROM allacts GROUP BY 1)
        |SELECT source, coalesce(n_props, 0) AS n_props,
        |  coalesce(n_apids, 0) AS n_apids,
        |  (coalesce(n_props, 0) = coalesce(n_apids, 0)) AS consistent
        |FROM props FULL OUTER JOIN apids USING (source)
        |ORDER BY source""".stripMargin),

    "h6_dedup_idempotence" -> (actsCte +
      """SELECT count(*) AS n_raw, count(DISTINCT aid) AS n_aids
        |FROM allacts""".stripMargin),

    "h7_composite_integrator" -> (actsCte +
      """SELECT 'lineitem-' || md5(sid || '|' || pid) AS aid,
        |  sid, pid, 'InChI=1S/P' || CAST(p_partkey AS VARCHAR) AS inchi,
        |  value, numvalue
        |FROM lsupp ORDER BY aid""".stripMargin),

    "h8_ice_grid" ->
      """WITH obs AS (
        |  SELECT o_custkey, o_orderpriority,
        |    quantile_cont(o_totalprice, 0.5) AS numvalue
        |  FROM orders GROUP BY 1, 2),
        |med AS (
        |  SELECT o_orderpriority, quantile_cont(numvalue, 0.5) AS med
        |  FROM obs GROUP BY 1),
        |grid AS (
        |  SELECT u.o_custkey, t.o_orderpriority, o.numvalue,
        |    CASE WHEN o.numvalue IS NULL THEN 'negative'
        |         WHEN o.numvalue >= m.med THEN 'positive'
        |         ELSE 'negative' END AS value
        |  FROM (SELECT DISTINCT o_custkey FROM orders) u
        |  CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) t
        |  LEFT JOIN obs o ON o.o_custkey = u.o_custkey
        |    AND o.o_orderpriority = t.o_orderpriority
        |  JOIN med m ON m.o_orderpriority = t.o_orderpriority),
        |cnts AS (
        |  SELECT *,
        |    count(*) OVER (PARTITION BY o_orderpriority, value) AS cnt
        |  FROM grid),
        |mins AS (
        |  SELECT *, min(cnt) OVER (PARTITION BY o_orderpriority) AS minc,
        |    row_number() OVER (PARTITION BY o_orderpriority, value
        |      ORDER BY md5(CAST(o_custkey AS VARCHAR) || '|' ||
        |        o_orderpriority)) AS rn
        |  FROM cnts),
        |bal AS (
        |  SELECT md5('cust:' || CAST(o_custkey AS VARCHAR)) AS sid,
        |    md5('prio:' || o_orderpriority) AS pid,
        |    'InChI=1S/C' || CAST(o_custkey AS VARCHAR) AS inchi,
        |    value, numvalue
        |  FROM mins WHERE rn <= minc)
        |SELECT 'icegrid-' || md5(sid || '|' || pid) AS aid,
        |  sid, pid, inchi, value, numvalue
        |FROM bal ORDER BY aid""".stripMargin
  )
}
