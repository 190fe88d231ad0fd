package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables

/** Remaining source formats — SURVEY §2.1. S6 (delimited text scan +
  * broadcast lookup join, the GHS-table pattern of
  * src/05_integrate_reach.R:11-13) reads the repo-shipped TSV; the
  * oracle inlines the same 5 rows as VALUES so the driver needs no file
  * access. S2/S9 (glob scan + parquet sink round-trip) are covered in
  * SourceSinkSpec — they need a scratch directory, which oracle SQL
  * can't see. S5 (JDBC) is declared but untestable offline: no JDBC
  * driver jar ships with the container; the call shape is
  * `spark.read.format("jdbc").option("url", "jdbc:sqlite:...")` as in
  * SURVEY §2.1.
  */
object SourceSinkQueries extends QueryModule {

  val queries: Map[String, Q] = Map(
    "s6_csv_lookup" -> ((s, d) => {
      val lookup = s.read
        .option("sep", "\t").option("header", "true")
        .csv("/root/repo/resources/region_lookup.tsv")
      Tables.region(s, d)
        .join(broadcast(lookup), Seq("r_name"))
        .join(Tables.nation(s, d),
          col("r_regionkey") === col("n_regionkey"))
        .groupBy(col("continent_group"))
        .agg(count(lit(1)).as("n_nations"),
          countDistinct(col("code")).as("n_regions"))
        .orderBy(col("continent_group"))
    }),

    // S6 variant: newline-delimited JSON scan — the sidecar-config
    // pattern (per-event-type weights shipped as JSONL, applied to the
    // fact aggregate). Schema is declared, not inferred: inference costs
    // an extra full pass over the file and can drift types between runs.
    // The weights table is tiny → broadcast left join; unmatched types
    // keep weight 1.0.
    "s12_jsonl_weights" -> ((s, d) => {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("event_type",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("weight",
          org.apache.spark.sql.types.DoubleType)))
      val weights = s.read.schema(schema)
        .json("/root/repo/resources/event_weights.jsonl")
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
        .join(broadcast(weights), Seq("event_type"), "left_outer")
        .withColumn("weight", coalesce(col("weight"), lit(1.0)))
        .withColumn("weighted_n", col("n") * col("weight"))
        .select(col("event_type"), col("n"), col("weight"),
          col("weighted_n"))
        .orderBy(col("event_type"))
    })
  )

  val oracle: Map[String, String] = Map(
    "s6_csv_lookup" ->
      """SELECT continent_group, count(*) AS n_nations,
        |  count(DISTINCT code) AS n_regions
        |FROM region
        |JOIN (VALUES ('AFRICA','AF','emea'), ('AMERICA','AM','amer'),
        |  ('ASIA','AS','apac'), ('EUROPE','EU','emea'),
        |  ('MIDDLE EAST','ME','emea'))
        |  AS l(r_name, code, continent_group) USING (r_name)
        |JOIN nation ON r_regionkey = n_regionkey
        |GROUP BY 1 ORDER BY continent_group""".stripMargin,

    "s12_jsonl_weights" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(coalesce(w.weight, 1.0) AS DOUBLE) AS weight,
        |  count(*) * CAST(coalesce(w.weight, 1.0) AS DOUBLE) AS weighted_n
        |FROM events
        |LEFT JOIN (VALUES ('click', 0.5), ('purchase', 2.0),
        |  ('signup', 1.5), ('view', 0.25)) AS w(event_type, weight)
        |  USING (event_type)
        |GROUP BY event_type, w.weight
        |ORDER BY event_type""".stripMargin
  )
}
