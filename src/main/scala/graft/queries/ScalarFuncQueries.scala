package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Numeric.dsum

/** Scalar function families — SURVEY.md §2.9 (F1-F10), plus datetime
  * functions (absent in the reference, required for a complete engine).
  *
  * Scale notes: all pure per-row expressions — fully codegen'd inside
  * WholeStageCodegen, no UDFs, no shuffles beyond the final small
  * aggregates. The provenance extraction (F9) is the reference's Python
  * UDF D4 re-expressed as native array expressions (SURVEY §2.10).
  */
object ScalarFuncQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    // F1: content-hash identity — md5 over a canonical key string
    // (ref: src/80_harmonize.py:40,55,83).
    "f1_hash_ids" -> ((s, d) => {
      Tables.customer(s, d)
        .withColumn("sid", md5(concat_ws("|", col("c_custkey"), col("c_name"))))
        .select(col("c_custkey"), col("sid"))
        .orderBy(col("c_custkey"))
    }),

    // F2: string split / regex / case mapping
    // (ref: src/10_integrate_bindingdb.R:76 gsub; src/02_integrate_chembl.R:42).
    "f2_string_regex" -> ((s, d) => {
      Tables.part(s, d)
        .withColumn("type_head", split(col("p_type"), " ").getItem(0))
        .withColumn("type_lower", lower(col("p_type")))
        .withColumn("name_digits",
          regexp_replace(col("p_name"), "[^0-9]", ""))
        .groupBy(col("type_head"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("type_lower")).as("n_types"),
          max(col("name_digits")).as("max_digits"))
        .orderBy(col("type_head"))
    }),

    // F3: concat / printf-style formatting — the reference's id prefixes
    // (ref: src/01_integrate_toxvaldb.R:42 paste0("toxvaldb-", n)).
    "f3_concat_format" -> ((s, d) => {
      Tables.nation(s, d)
        .withColumn("tag", format_string("nation-%03d", col("n_nationkey")))
        .withColumn("label", concat_ws(":", col("n_name"), col("n_regionkey")))
        .select(col("n_nationkey"), col("tag"), col("label"))
        .orderBy(col("n_nationkey"))
    }),

    // F4: casts — floor-then-cast so double→int semantics agree across
    // engines (Spark truncates, DuckDB rounds; floor removes the ambiguity).
    "f4_casts" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("price_int", floor(col("o_totalprice")).cast("long"))
        .withColumn("key_str", col("o_orderkey").cast("string"))
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("price_int")).as("sum_price_int"),
          max(length(col("key_str"))).as("max_keylen"))
        .orderBy(col("o_orderstatus"))
    }),

    // F5: coalesce / nullif chains (ref: src/tests.py:36-37).
    "f5_null_funcs" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("v", coalesce(nullif(col("value"), lit(0.0)), lit(-1.0)))
        .groupBy(col("event_type"))
        .agg(count(when(col("v") === -1.0, 1)).as("n_zero_or_null"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type"))
    }),

    // F6: JSON parse — typed access into the events.props blob, the engine's
    // from_json/get_json_object surface (ref: src/helper/udf.py JSON work;
    // SURVEY §1.4 "expose typed access via from_json").
    "f6_json_extract" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), max(col("k")).as("max_k"),
          count(when(col("k").isNull, 1)).as("n_null"))
        .orderBy(col("event_type"))
    }),

    // F9: array ops — provenance-from-path as pure expressions, replacing
    // the reference's Python UDF match_source (ref: src/80_harmonize.py:24-28;
    // SURVEY §2.10 D4).
    "f9_array_provenance" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("path",
          concat_ws("/", lit("staging"), col("event_type"),
            lit("activities.parquet")))
        .withColumn("src",
          expr("try_element_at(filter(split(path, '/'), " +
            "x -> array_contains(array('click','view','purchase'), x)), -1)"))
        .groupBy(col("src"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("src").asc_nulls_first)
    }),

    // Array algebra: intersect/union/except/sort over token sets — the
    // set operations at column granularity.
    "f14_array_algebra" -> ((s, d) => {
      Tables.documents(s, d)
        .withColumn("ts", expr("array_distinct(split(lower(text), ' '))"))
        .withColumn("stop", expr("array('the','a','and','of','to')"))
        .withColumn("n_stop_hits", expr("size(array_intersect(ts, stop))"))
        .withColumn("n_content", expr("size(array_except(ts, stop))"))
        .withColumn("first_sorted",
          expr("try_element_at(array_sort(ts), 1)"))
        .groupBy(col("lang"))
        .agg(sum(col("n_stop_hits")).as("sum_stop"),
          sum(col("n_content")).as("sum_content"),
          min(col("first_sorted")).as("min_first"))
        .orderBy(col("lang"))
    }),

    // Quantile feature binning — the quantile-discretizer step of a
    // feature pipeline: exact quartile edges via the DISTRIBUTED exact
    // rank (count pass + range-partitioned sort + rank pick,
    // Ops.exactQuantiles — never one aggregation buffer holding the full
    // column), then per-row case_when bin assignment, census per bin.
    // NOT ntile: a global ntile window is a global sort per ROW; the
    // edges are three scalars and binning stays map-side at any scale.
    "f15_quantile_bins" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val Seq(e0, e1, e2) = graft.operators.Ops.exactQuantiles(
        li, "l_extendedprice", Seq(0.25, 0.5, 0.75))
      li.withColumn("bin",
          when(col("l_extendedprice") < e0, 0)
            .when(col("l_extendedprice") < e1, 1)
            .when(col("l_extendedprice") < e2, 2)
            .otherwise(3))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n"),
          dsum(col("l_extendedprice")).as("sum_price"))
        .orderBy(col("bin"))
    }),

    // F10: string distance — levenshtein for label similarity
    // (ref: src/helper/magentic_label.py:11-12).
    "f10_levenshtein" -> ((s, d) => {
      Tables.nation(s, d)
        .withColumn("dist", levenshtein(col("n_name"), lit("UNITED STATES")))
        .select(col("n_name"), col("dist"))
        .orderBy(col("dist"), col("n_name"))
    }),

    // D1 on dirty input: the canonicalizer UDF over events.props (spacing
    // noise), md5'd — the id-defining path of the harmonize pipeline
    // exercised against DuckDB's JSON minifier (props are single-key, so
    // minified == canonical).
    "d1_canonicalize_props" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("canon",
          graft.functions.CanonicalJson.canonicalizeJson(col("props")))
        .groupBy(col("event_type"))
        .agg(count(col("canon")).as("n_ok"),
          countDistinct(md5(col("canon"))).as("n_ids"))
        .orderBy(col("event_type"))
    }),

    // F6b: schema-typed JSON access via from_json (SURVEY §1.4 "expose
    // typed access via from_json with per-source StructType").
    "f12_from_json" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("parsed", from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT")))
        .groupBy(col("event_type"))
        .agg(sum(col("parsed.k")).as("sum_k"),
          count(when(col("parsed.k").isNotNull, 1)).as("n_parsed"))
        .orderBy(col("event_type"))
    }),

    // F6c: MapType view of the JSON blob (SURVEY §1.4 "MapType(String,
    // String) view") — schema-free key census via map_keys + explode.
    "f13_json_map_view" -> ((s, d) => {
      Tables.events(s, d)
        .withColumn("m", from_json(col("props"),
          org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)))
        .select(explode(map_keys(col("m"))).as("key"))
        .groupBy(col("key"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("key"))
    }),

    // Extra: datetime functions — none exist in the reference (SURVEY §2.9
    // note) but any engine at this scale needs calendar bucketing.
    "f11_datetime" -> ((s, d) => {
      Tables.orders(s, d)
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("mo", month(col("o_orderdate")))
        .groupBy(col("yr"), col("mo"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("total"))
        .orderBy(col("yr"), col("mo"))
    })
  )

  val oracle: Map[String, String] = Map(
    "f1_hash_ids" ->
      """SELECT c_custkey, md5(concat_ws('|', c_custkey, c_name)) AS sid
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "f2_string_regex" ->
      """SELECT string_split(p_type, ' ')[1] AS type_head, count(*) AS n,
        |  count(DISTINCT lower(p_type)) AS n_types,
        |  max(regexp_replace(p_name, '[^0-9]', '', 'g')) AS max_digits
        |FROM part GROUP BY 1 ORDER BY type_head""".stripMargin,

    "f3_concat_format" ->
      """SELECT n_nationkey, printf('nation-%03d', n_nationkey) AS tag,
        |  concat_ws(':', n_name, n_regionkey) AS label
        |FROM nation ORDER BY n_nationkey""".stripMargin,

    "f4_casts" ->
      """SELECT o_orderstatus,
        |  CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS sum_price_int,
        |  max(length(CAST(o_orderkey AS VARCHAR))) AS max_keylen
        |FROM orders GROUP BY 1 ORDER BY o_orderstatus""".stripMargin,

    "f5_null_funcs" ->
      """SELECT event_type,
        |  count(CASE WHEN coalesce(nullif(value, 0.0), -1.0) = -1.0
        |    THEN 1 END) AS n_zero_or_null,
        |  count(*) AS n
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "f6_json_extract" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |  max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
        |  count(CASE WHEN json_extract_string(props, '$.k') IS NULL
        |    THEN 1 END) AS n_null
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "f9_array_provenance" ->
      """SELECT src, count(*) AS n FROM (
        |  SELECT list_filter(
        |    string_split(concat_ws('/', 'staging', event_type,
        |      'activities.parquet'), '/'),
        |    x -> list_contains(['click','view','purchase'], x))[-1] AS src
        |  FROM events)
        |GROUP BY 1 ORDER BY src NULLS FIRST""".stripMargin,

    "f14_array_algebra" ->
      """SELECT lang,
        |  CAST(sum(len(list_intersect(ts, ['the','a','and','of','to']))) AS BIGINT)
        |    AS sum_stop,
        |  CAST(sum(len(list_filter(ts,
        |    x -> NOT list_contains(['the','a','and','of','to'], x)))) AS BIGINT)
        |    AS sum_content,
        |  min(list_sort(ts)[1]) AS min_first
        |FROM (
        |  SELECT lang, list_distinct(string_split(lower(text), ' ')) AS ts
        |  FROM documents)
        |GROUP BY 1 ORDER BY lang""".stripMargin,

    "f10_levenshtein" ->
      """SELECT n_name, levenshtein(n_name, 'UNITED STATES') AS dist
        |FROM nation ORDER BY dist, n_name""".stripMargin,

    "f15_quantile_bins" ->
      """WITH e AS (
        |  SELECT quantile_cont(l_extendedprice, 0.25) AS e0,
        |    quantile_cont(l_extendedprice, 0.5) AS e1,
        |    quantile_cont(l_extendedprice, 0.75) AS e2
        |  FROM lineitem)
        |SELECT bin, count(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
        |    AS sum_price
        |FROM (
        |  SELECT l_extendedprice,
        |    CASE WHEN l_extendedprice < e0 THEN 0
        |         WHEN l_extendedprice < e1 THEN 1
        |         WHEN l_extendedprice < e2 THEN 2
        |         ELSE 3 END AS bin
        |  FROM lineitem CROSS JOIN e)
        |GROUP BY 1 ORDER BY bin""".stripMargin,

    "f13_json_map_view" ->
      """SELECT key, count(*) AS n FROM (
        |  SELECT unnest(json_keys(props)) AS key FROM events)
        |GROUP BY 1 ORDER BY key""".stripMargin,

    "d1_canonicalize_props" ->
      """SELECT event_type, count(*) AS n_ok,
        |  count(DISTINCT md5(json_extract(props, '$')::VARCHAR)) AS n_ids
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "f12_from_json" ->
      """SELECT event_type,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
        |  count(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
        |    THEN 1 END) AS n_parsed
        |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin,

    "f11_datetime" ->
      """SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
        |  count(*) AS n,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM orders GROUP BY 1, 2 ORDER BY yr, mo""".stripMargin
  )
}
